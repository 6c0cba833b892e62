"""Wave-50 tests: Pettitt on a planted step, BH textbook adjustment,
G-test vs hand computation, kappa edge cases, DOW index accounting."""

from __future__ import annotations

import datetime as dt
import math


def _events(spark, counts, etype="x"):
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, etype))
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )


def test_pettitt_planted_step(spark):
    from mcas_question2_etl_spark.operators.timeseries import pettitt_changepoint

    # level shift after day 5: 2,2,2,2,2 then 9,9,9,9,9
    df = _events(spark, [2] * 5 + [9] * 5)
    out = pettitt_changepoint(df).collect()[0]
    # V_i = -5 for low days, +5 for high days; U peaks at t=5: |U|=25
    assert out.n_days == 10 and out.k_stat == 25
    assert out.change_day == dt.date(2024, 1, 5)
    p = 2 * math.exp(-6 * 25 * 25 / (1000 + 100))
    assert math.isclose(out.p_value, round(p, 9), rel_tol=1e-9)


def test_pettitt_flat_series(spark):
    from mcas_question2_etl_spark.operators.timeseries import pettitt_changepoint

    out = pettitt_changepoint(_events(spark, [3] * 6)).collect()[0]
    assert out.k_stat == 0 and math.isclose(out.p_value, 2.0)
    # ties at zero -> earliest day wins
    assert out.change_day == dt.date(2024, 1, 1)


def test_bh_adjust_textbook(spark):
    from mcas_question2_etl_spark.operators.evaluation import bh_adjust

    # classic: p = .01, .02, .03, .04 with m=4
    # q = .04, .04, .04, .04 -> all adjusted to .04
    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.04)], ["k", "p"]
    )
    out = {r.k: r for r in bh_adjust(df, "k", "p").collect()}
    for k in "abcd":
        assert math.isclose(out[k].p_adj, 0.04, rel_tol=1e-9)
    assert out["a"].p_rank == 1 and out["d"].p_rank == 4


def test_bh_adjust_mixed_and_capped(spark):
    from mcas_question2_etl_spark.operators.evaluation import bh_adjust

    # p = .005, .3, .9: adj = .015, .45, .9; nothing exceeds 1
    df = spark.createDataFrame(
        [("a", 0.005), ("b", 0.3), ("c", 0.9)], ["k", "p"]
    )
    out = {r.k: r.p_adj for r in bh_adjust(df, "k", "p").collect()}
    assert math.isclose(out["a"], 0.015, rel_tol=1e-9)
    assert math.isclose(out["b"], 0.45, rel_tol=1e-9)
    assert math.isclose(out["c"], 0.9, rel_tol=1e-9)


def test_g_test_hand_table(spark):
    from mcas_question2_etl_spark.operators.evaluation import g_test

    # 2x2: (a,x)=10, (a,y)=10, (b,x)=10, (b,y)=30
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 10 + [("b", "x")] * 10
        + [("b", "y")] * 30
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    out = g_test(df, "r", "c").collect()
    cells = {(r.r, r.c): r for r in out}
    g = 0.0
    for (rr, cc), o, rn, cn in [
        (("a", "x"), 10, 20, 20), (("a", "y"), 10, 20, 40),
        (("b", "x"), 10, 40, 20), (("b", "y"), 30, 40, 40),
    ]:
        e = rn * cn / 60
        assert math.isclose(cells[(rr, cc)].expected, e, rel_tol=1e-12)
        g += 2 * o * math.log(o / e)
    assert math.isclose(out[0].g_stat, round(g, 9), rel_tol=1e-9)
    assert out[0].dof == 1


def test_g_test_zero_cell_preserved(spark):
    from mcas_question2_etl_spark.operators.evaluation import g_test

    rows = [("a", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, ["r", "c"])
    cells = {(r.r, r.c): r for r in g_test(df, "r", "c").collect()}
    assert len(cells) == 4
    assert cells[("a", "y")].n_obs == 0 and cells[("a", "y")].g_contrib == 0.0


def test_cohens_kappa_perfect_and_independent(spark):
    from mcas_question2_etl_spark.operators.evaluation import cohens_kappa
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (0, 0), (0, 0)], ["a", "b"]
    )
    out = cohens_kappa(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert out.kappa == 1.0 and out.po == 1.0

    # raters agree exactly at chance: marginals 1/2, po = 1/2 -> kappa 0
    df2 = spark.createDataFrame(
        [(1, 1), (1, 0), (0, 1), (0, 0)], ["a", "b"]
    )
    out2 = cohens_kappa(df2, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert math.isclose(out2.kappa, 0.0, abs_tol=1e-12)
    assert out2.n11 == 1 and out2.n00 == 1


def test_dow_index_accounting(spark):
    from mcas_question2_etl_spark.operators.timeseries import (
        dow_seasonality_index,
    )

    # 14 days starting Mon 2024-01-01: Mondays get 10, others 3
    counts = [10 if d % 7 == 0 else 3 for d in range(14)]
    df = _events(spark, counts)
    out = {r.dow: r for r in dow_seasonality_index(df).collect()}
    assert out[1].n_days == 2 and out[1].n_events == 20
    overall = sum(counts) / 14
    assert math.isclose(out[1].seasonal_index, 10 / overall, rel_tol=1e-12)
    assert math.isclose(out[2].seasonal_index, 3 / overall, rel_tol=1e-12)
    # weighted mean of indices over days is 1
    tot = sum(out[d].n_days * out[d].seasonal_index for d in out) / 14
    assert math.isclose(tot, 1.0, rel_tol=1e-12)
