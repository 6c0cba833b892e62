"""Wave-92 hand pins: LMG relative importance and the transition
latency profile. LMG is recomputed independently by literally fitting
every subset regression with numpy lstsq and averaging R² increments
over all 6 orderings (the definition, not the closed form); the
transition profile by a plain-Python event-walk replay.

Covered spec names: lmg_importance_price, transition_latency_profile.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.regression import lmg_importance


def _r2_subset(X_cols, yv):
    if not X_cols:
        return 0.0
    X = np.column_stack([np.ones(len(yv))] + list(X_cols))
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    resid = yv - X @ beta
    return 1.0 - (resid**2).sum() / ((yv - yv.mean()) ** 2).sum()


def _lmg_ref(cols, yv):
    """Definition-form LMG: average R² increment over all orderings."""
    names = list(cols)
    shares = {n: 0.0 for n in names}
    orderings = list(itertools.permutations(names))
    for order in orderings:
        so_far = []
        prev = 0.0
        for n in order:
            so_far.append(n)
            r2 = _r2_subset([cols[m] for m in so_far], yv)
            shares[n] += r2 - prev
            prev = r2
    return {n: s / len(orderings) for n, s in shares.items()}


def test_lmg_matches_definition_by_subset_refits(spark):
    rng = np.random.RandomState(21)
    n = 400
    a = rng.rand(n)
    b = 0.6 * a + 0.4 * rng.rand(n)  # collinear with a by design
    c = rng.rand(n)
    yv = 5.0 * a + 3.0 * b + 1.0 * c + 0.3 * rng.rand(n)
    df = spark.createDataFrame(
        [
            (float(x1), float(x2), float(x3), float(yy))
            for x1, x2, x3, yy in zip(a, b, c, yv)
        ],
        "a double, b double, c double, y double",
    )
    out = {
        r.variable: r
        for r in lmg_importance(df, ["a", "b", "c"], "y").collect()
    }
    ref = _lmg_ref({"a": a, "b": b, "c": c}, yv)
    for k in ("a", "b", "c"):
        assert out[k].lmg_share == pytest.approx(ref[k], abs=1e-6)
    # additivity: shares sum to the full-model R² exactly
    r2_full = _r2_subset([a, b, c], yv)
    assert sum(r.lmg_share for r in out.values()) == pytest.approx(
        r2_full, abs=1e-5
    )
    assert sum(r.pct_of_r2 for r in out.values()) == pytest.approx(
        1.0, abs=1e-5
    )
    # the dominant driver wins despite the collinearity
    assert out["a"].lmg_share > out["c"].lmg_share


def test_lmg_symmetric_under_exchangeable_predictors(spark):
    rng = np.random.RandomState(5)
    n = 500
    a, b = rng.rand(n), rng.rand(n)
    c = rng.rand(n) * 1e-3  # near-noise third predictor
    yv = a + b + 0.01 * rng.rand(n)
    df = spark.createDataFrame(
        [
            (float(x1), float(x2), float(x3), float(yy))
            for x1, x2, x3, yy in zip(a, b, c, yv)
        ],
        "a double, b double, c double, y double",
    )
    out = {
        r.variable: r.lmg_share
        for r in lmg_importance(df, ["a", "b", "c"], "y").collect()
    }
    # independent, equal-coefficient predictors share ~equally
    assert out["a"] == pytest.approx(out["b"], abs=0.03)
    assert out["c"] < 0.01


def test_lmg_rejects_wrong_arity(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, y double")
    with pytest.raises(ValueError):
        lmg_importance(df, ["a"], "y")


def test_transition_latency_matches_python_replay(spark):
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # user 1: A -> B (10s) -> A (20s); user 2: A -> B (40s)
    seq = {
        1: [("A", 0), ("B", 10), ("A", 30)],
        2: [("A", 100), ("B", 140)],
    }
    eid = 0
    for uid, evs in seq.items():
        for etype, sec in evs:
            rows.append(
                (eid, t0 + dt.timedelta(seconds=sec), uid, etype, 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = events.select(
        F.col("event_type"),
        F.unix_micros("ts").alias("t"),
        F.lead("event_type").over(w).alias("to_type"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_t"),
    ).filter(F.col("to_type").isNotNull())
    gaps = seqd.select(
        F.col("event_type").alias("from_type"),
        "to_type",
        (F.col("next_t") - F.col("t")).alias("gap_us"),
    ).collect()
    got = sorted((r.from_type, r.to_type, r.gap_us) for r in gaps)
    want = sorted(
        [
            ("A", "B", 10_000_000),
            ("B", "A", 20_000_000),
            ("A", "B", 40_000_000),
        ]
    )
    assert got == want
