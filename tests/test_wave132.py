"""Wave 132 — two-period difference-in-differences.

Hand-pinned tests for operators/causal.py diff_in_diff: the estimator
recovers a planted treatment effect while canceling both a group level
gap and a common time shock; a placebo (no effect) run returns ~0; SE
matches the four-cell Welch form recomputed by hand; SQL-twin equality.
Spec: did_event_value (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math
import statistics

import duckdb
import pytest

from mcas_question2_etl_spark.operators.causal import (
    diff_in_diff,
    diff_in_diff_sql,
)


def _cells(effect):
    """Deterministic panel: group gap +50, time shock +7, noise from a
    small fixed pattern, planted treatment effect on (T, post)."""
    noise = [0.25, -0.5, 1.0, -0.75, 0.5, -0.25, 0.75, -1.0]
    rows = []
    for g in (True, False):
        for p in (True, False):
            base = 100.0 + (50.0 if g else 0.0) + (7.0 if p else 0.0)
            if g and p:
                base += effect
            for k in range(8):
                rows.append((g, p, round(base + noise[k], 2)))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "g boolean, p boolean, v double")


def test_recovers_planted_effect_and_cancels_confounds(spark):
    r = diff_in_diff(_df(spark, _cells(12.0)), "g", "p", "v").collect()[0]
    assert r.n_obs == 32
    # noise pattern is identical in every cell, so it cancels exactly
    assert r.did_effect == pytest.approx(12.0, abs=1e-9)
    assert r.pre_gap == pytest.approx(50.0, abs=1e-9)
    assert r.post_gap == pytest.approx(62.0, abs=1e-9)
    assert r.z_stat > 5


def test_placebo_is_zero(spark):
    r = diff_in_diff(_df(spark, _cells(0.0)), "g", "p", "v").collect()[0]
    assert r.did_effect == pytest.approx(0.0, abs=1e-9)


def test_se_matches_welch_form(spark):
    rows = _cells(5.0)
    r = diff_in_diff(_df(spark, rows), "g", "p", "v").collect()[0]
    se2 = 0.0
    for g in (True, False):
        for p in (True, False):
            vals = [v for gg, pp, v in rows if gg == g and pp == p]
            se2 += statistics.variance(vals) / len(vals)
    assert r.se == pytest.approx(round(math.sqrt(se2), 6), abs=1e-9)
    assert r.z_stat == pytest.approx(
        round(5.0 / math.sqrt(se2), 6), abs=1e-4
    )


def test_sql_twin_matches_spark_exactly(spark):
    rows = _cells(3.5)
    r = diff_in_diff(_df(spark, rows), "g", "p", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (g BOOLEAN, p BOOLEAN, v DOUBLE)")
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", rows)
    row = con.execute(
        diff_in_diff_sql("SELECT * FROM t0", "g", "p", "v")
    ).fetchone()
    assert row == (
        r.n_obs, r.did_effect, r.se, r.z_stat, r.pre_gap, r.post_gap
    )
