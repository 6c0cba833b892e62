"""Wave-59 tests: norm audit pins, dead-dim detection, OOV hand case,
Weibull on synthetic Weibull-ish data, Gumbel return-level math."""

from __future__ import annotations

import datetime as dt
import math


def test_embedding_norm_audit_pins(spark):
    from mcas_question2_etl_spark.operators.similarity import (
        embedding_norm_audit,
    )

    rows = [
        (1, [1.0, 0.0, 0.0], 0),   # unit
        (2, [0.6, 0.8, 0.0], 0),   # unit
        (3, [3.0, 4.0, 0.0], 0),   # norm 5
        (4, [0.0, 0.0, 0.0], 1),   # zero
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r.label: r for r in embedding_norm_audit(df).collect()}
    assert out[0].n == 3 and out[0].n_near_unit == 2
    assert math.isclose(out[0].max_norm, 5.0, rel_tol=1e-5)
    assert out[1].min_norm == 0.0 and out[1].n_near_unit == 0


def test_embedding_dim_variance_dead_dim(spark):
    from mcas_question2_etl_spark.operators.similarity import (
        embedding_dim_variance,
    )

    rows = [(i, [float(i % 3), 0.5, float(i)], 0) for i in range(12)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r.dim: r for r in embedding_dim_variance(df).collect()}
    assert out[1].near_zero_variance  # constant 0.5
    assert not out[0].near_zero_variance and not out[2].near_zero_variance
    assert math.isclose(out[1].mean, 0.5, rel_tol=1e-5)
    assert out[0].n == 12


def test_oov_rate_hand_case(spark):
    from mcas_question2_etl_spark.operators.text import oov_rate_by_source

    # ids 0..3 train, 4..7 test (half split on id range)
    rows = [
        (0, "alpha beta", "s1"),
        (1, "beta gamma", "s1"),
        (2, "alpha", "s2"),
        (3, "gamma", "s2"),
        (4, "alpha novel", "s1"),   # 1 of 2 OOV
        (5, "beta beta", "s1"),     # 0 of 2
        (6, "brandnew", "s2"),      # 1 of 1
        (7, "gamma", "s2"),         # 0 of 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r for r in oov_rate_by_source(df).collect()}
    assert out["s1"].n_tokens == 4 and out["s1"].n_oov == 1
    assert math.isclose(out["s1"].oov_rate, 0.25, rel_tol=1e-12)
    assert out["s2"].n_tokens == 2 and out["s2"].n_oov == 1


def test_weibull_fit_recovers_exponential(spark):
    from mcas_question2_etl_spark.operators.survival import (
        weibull_lifetime_fit,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # lifetimes follow a geometric-ish decay (discrete exponential,
    # Weibull shape ~ 1): many short, few long
    life_counts = {1: 40, 2: 25, 3: 15, 5: 10, 8: 6, 13: 4}
    u = 0
    for life, n_users in life_counts.items():
        for _ in range(n_users):
            u += 1
            eid += 1
            rows.append((eid, base, u, "x"))
            eid += 1
            rows.append((eid, base + dt.timedelta(days=life), u, "x"))
    # horizon extender (censoring margin)
    eid += 1
    rows.append((eid, base + dt.timedelta(days=40), 9999, "x"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = weibull_lifetime_fit(df).collect()[0]
    assert out.n_points >= 4
    assert 0.3 < out.shape < 2.5  # sane Weibull neighborhood
    assert out.scale > 0


def test_gumbel_return_levels_math(spark):
    from mcas_question2_etl_spark.operators.timeseries import (
        extreme_value_return_levels,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    counts = [3, 5, 4, 8, 7, 11, 10, 14, 6, 9]
    for day, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "x"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.horizon_days: r for r in
           extreme_value_return_levels(df).collect()}
    mean = sum(counts) / len(counts)
    sd = math.sqrt(sum(c * c for c in counts) / len(counts) - mean * mean)
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    for n_h in (30, 90, 365):
        rl = mu - beta * math.log(-math.log(1 - 1 / n_h))
        assert math.isclose(out[n_h].return_level, rl, rel_tol=1e-9)
    # longer horizon -> higher level
    assert out[365].return_level > out[90].return_level > out[30].return_level
