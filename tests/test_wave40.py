"""Wave-40 tests: Benford digit extraction edges, TWAP interval
weighting and tie handling, Neyman allocation math, weighted-quantile
picks, Markov cycle fixpoint."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def test_benford_digit_extraction_edges(spark):
    from mcas_question2_etl_spark.operators.benford import benford_audit

    # 999.7 must floor to 999 (digit 9), never round to 1000 (digit 1);
    # 0.5 has no integer-part digit and is excluded
    df = spark.createDataFrame(
        [(1.0,), (19.2,), (25.0,), (999.7,), (0.5,)], ["x"]
    )
    rows = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert {d: rows[d].n_obs for d in rows} == {1: 2, 2: 1, 9: 1}
    assert math.isclose(rows[1].p_benford, math.log10(2), rel_tol=1e-12)
    assert math.isclose(rows[1].p_obs, 0.5, rel_tol=1e-12)


def test_twap_interval_weighting(spark):
    from mcas_question2_etl_spark.operators.timeseries import time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, 1.0),
        (2, base + dt.timedelta(seconds=10), 1, 2.0),
        (3, base + dt.timedelta(seconds=30), 1, 3.0),  # last: no interval
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = time_weighted_avg(df).collect()
    assert len(out) == 1
    # value 1 held 10s, value 2 held 20s -> (1*10 + 2*20) / 30
    assert math.isclose(out[0].twap, 50.0 / 30.0, rel_tol=1e-12)
    assert out[0].n_intervals == 2


def test_twap_simultaneous_events_tiebreak(spark):
    from mcas_question2_etl_spark.operators.timeseries import time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, 10.0),
        (2, base, 1, 20.0),  # same instant: event_id order decides
        (3, base + dt.timedelta(seconds=5), 1, 0.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = time_weighted_avg(df).collect()[0]
    # event 1 holds 0us (tie), event 2 holds the 5s span
    assert math.isclose(out.twap, 20.0, rel_tol=1e-12)


def test_neyman_allocation_concentrates_on_variance(spark):
    from mcas_question2_etl_spark.operators.sampling import neyman_allocation

    rows = [("A", 1, 0), ("A", 2, 10), ("B", 3, 5), ("B", 4, 5), ("B", 5, 5)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = {r.source: r for r in
           neyman_allocation(df, "source", "n_chars", "doc_id", budget=10).collect()}
    # sigma_B = 0 -> all budget to A; alloc may exceed N, take caps at N
    assert out["B"].alloc == 0 and out["B"].n_kept == 0
    assert out["A"].alloc == 10 and out["A"].n_kept == 2
    assert math.isclose(out["A"].sigma, math.sqrt(50.0), rel_tol=1e-12)


def test_weighted_quantiles_known_picks(spark):
    from mcas_question2_etl_spark.operators.aggregates import weighted_quantiles

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 2.0)],
        ["grp", "v", "w"],
    )
    row = weighted_quantiles(df, "grp", "v", "w").collect()[0]
    # cum: 1->1, 2->2, 3->4 of T=4; thresholds 1/2/3
    assert (row.p25, row.p5, row.p75) == (1.0, 2.0, 3.0)
    assert row.total_w == 4.0


def test_markov_two_state_cycle_is_uniform_fixpoint(spark):
    from mcas_question2_etl_spark.operators.markov import (
        stationary_mix,
        transition_counts,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, t)
        for i, t in enumerate(["a", "b", "a", "b", "a"])
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.event_type: r.pi for r in
           stationary_mix(transition_counts(ev), rounds=3).collect()}
    # deterministic a<->b cycle: uniform is the stationary distribution
    assert math.isclose(out["a"], 0.5, rel_tol=1e-12)
    assert math.isclose(out["b"], 0.5, rel_tol=1e-12)


def test_markov_sink_states_pi_renormalized(spark):
    """ADVICE r3: transitions into sink types leak mass each round; the
    output pi must be renormalized to a proper distribution over the
    tracked (source) states."""
    from mcas_question2_etl_spark.operators.markov import (
        stationary_mix,
        transition_counts,
    )

    base = dt.datetime(2024, 1, 1)
    # one user ending in "end": transitions a->a, a->b, b->end, so
    # "end" has no outgoing edges (true sink); sources are {a, b} and
    # half the mass leaks into the sink each a-step
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, t)
        for i, t in enumerate(["a", "a", "b", "end"])
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.event_type: r.pi for r in
           stationary_mix(transition_counts(ev), rounds=3).collect()}
    assert set(out) == {"a", "b"}  # sink excluded from tracked states
    assert math.isclose(sum(out.values()), 1.0, rel_tol=1e-12)
