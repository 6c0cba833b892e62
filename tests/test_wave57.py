"""Wave-57 tests: DiD python replay, CUPED identity + reduction,
rolling corr pins, tier migration accounting, McNemar hand cases."""

from __future__ import annotations

import datetime as dt
import math


def test_did_python_replay(spark):
    from mcas_question2_etl_spark.operators.evaluation import did_estimator
    from mcas_question2_etl_spark.operators.sampling import hash_bucket
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # users 1..40: u events in half1, (u % 7) in half2
    for u in range(1, 41):
        for _ in range(u % 5 + 1):
            eid += 1
            rows.append((eid, base, u, "x"))
        for _ in range(u % 7):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=20), u, "x"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = did_estimator(df).collect()[0]
    arms = {
        r.user_id: r.arm
        for r in df.select("user_id")
        .distinct()
        .withColumn("arm", hash_bucket("user_id", 2))
        .collect()
    }
    a_d = [(u % 7) - (u % 5 + 1) for u in range(1, 41) if arms[u] == 0]
    b_d = [(u % 7) - (u % 5 + 1) for u in range(1, 41) if arms[u] != 0]

    def mv(xs):
        m = sum(xs) / len(xs)
        v = sum(x * x for x in xs) / len(xs) - m * m
        return m, v / len(xs)

    ma, va = mv(a_d)
    mb, vb = mv(b_d)
    assert out.n_a == len(a_d) and out.n_b == len(b_d)
    assert math.isclose(out.did, ma - mb, rel_tol=1e-12)
    assert math.isclose(out.se, math.sqrt(va + vb), rel_tol=1e-12)


def test_cuped_reduces_variance_when_correlated(spark):
    from mcas_question2_etl_spark.operators.evaluation import (
        cuped_adjusted_lift,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # post strongly tracks pre -> theta ~ slope, var_ratio << 1
    for u in range(1, 61):
        pre = u % 6 + 1
        post = 2 * pre + (u % 3)
        for _ in range(pre):
            eid += 1
            rows.append((eid, base, u, "x"))
        for _ in range(post):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=20), u, "x"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = cuped_adjusted_lift(df).collect()[0]
    assert out.var_ratio < 0.3  # strong predictor -> big reduction
    assert out.theta > 1.0
    assert out.n_a + out.n_b == 60


def test_rolling_correlation_perfect_track(spark):
    from mcas_question2_etl_spark.operators.timeseries import rolling_correlation

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # purchases = clicks exactly each day, both varying -> r = 1
    for day in range(10):
        n = day % 3 + 1
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "click"))
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "purchase"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = rolling_correlation(df, window_days=5).collect()
    for r in out:
        if r.n_days_in_window >= 2 and r.r is not None:
            assert math.isclose(r.r, 1.0, rel_tol=1e-12)
    # first day window has one point -> degenerate -> NULL
    assert out[0].r is None


def test_tier_migration_accounting(spark):
    from mcas_question2_etl_spark.operators.segmentation import (
        tier_migration_matrix,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 10 customers spend in half1; 5 of them (even ids) also in half2;
    # customer 99 appears only in half2
    for u in range(1, 11):
        rows.append((u, base, 100.0 * u))
        if u % 2 == 0:
            rows.append((u, base + dt.timedelta(days=30), 50.0 * u))
    rows.append((99, base + dt.timedelta(days=30), 10.0))
    df = spark.createDataFrame(rows, ["cust", "ts", "price"])
    out = tier_migration_matrix(df, "cust", "ts", "price", k=5).collect()
    total = sum(r.n_units for r in out)
    assert total == 11
    # inactive-post rows exist (odd customers), inactive-pre for 99
    inactive_post = sum(r.n_units for r in out if r.tier_post == 0)
    inactive_pre = sum(r.n_units for r in out if r.tier_pre == 0)
    assert inactive_post == 5 and inactive_pre == 1


def test_mcnemar_hand_cases(spark):
    from mcas_question2_etl_spark.operators.evaluation import mcnemar_gates
    from pyspark.sql import functions as F

    # b=8, c=2 -> chi2 = 36/10 = 3.6; corrected = 25/10 = 2.5
    rows = (
        [(1, 1)] * 5 + [(1, 0)] * 8 + [(0, 1)] * 2 + [(0, 0)] * 5
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    out = mcnemar_gates(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert out.n10 == 8 and out.n01 == 2
    assert math.isclose(out.chi2, 3.6, rel_tol=1e-12)
    assert math.isclose(out.chi2_corrected, 2.5, rel_tol=1e-12)
    assert not out.significant

    # perfectly agreeing gates: b = c = 0 -> chi2 = 0 by convention
    df2 = spark.createDataFrame([(1, 1), (0, 0)], ["a", "b"])
    out2 = mcnemar_gates(df2, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert out2.chi2 == 0.0 and not out2.significant
