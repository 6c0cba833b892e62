"""Wave 149 — sharp regression-discontinuity estimator.

Hand-pinned two-side OLS recomputation, a planted-jump detection pair
(jump recovered within noise; no-jump gives effect ~ 0 on an exactly
linear series), band-edge inclusion semantics ([c-h, c) vs [c, c+h]),
and SQL-twin equality. Spec: rdd_quantity_price_jump
(plans/ops_bi_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.causal import rdd_sharp, rdd_sharp_sql


def _df(spark, rows):
    return spark.createDataFrame(
        [(float(x), float(y)) for x, y in rows], "x double, y double"
    )


def _ols(pts):
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts) - sx * sx / n
    sxy = sum(p[0] * p[1] for p in pts) - sx * sy / n
    syy = sum(p[1] * p[1] for p in pts) - sy * sy / n
    b = sxy / sxx
    a = sy / n - b * sx / n
    sse = syy - b * sxy
    var_a = (sse / (n - 2)) * (1 / n + (sx / n) ** 2 / sxx)
    return a, b, var_a


def _hand(rows, c, h):
    lpts = [(x - c, y) for x, y in rows if c - h <= x < c]
    rpts = [(x - c, y) for x, y in rows if c <= x <= c + h]
    a_l, b_l, v_l = _ols(lpts)
    a_r, b_r, v_r = _ols(rpts)
    tau = a_r - a_l
    return len(lpts), len(rpts), b_l, b_r, tau, tau / math.sqrt(v_l + v_r)


def test_hand_recomputation(spark):
    rows = [
        (x, 2.0 * x + (5.0 if x >= 10 else 0.0) + ((x * 7) % 3) * 0.25)
        for x in [4, 5, 6, 7, 8, 9, 11, 12, 13, 14, 15, 16]
    ]
    r = rdd_sharp(_df(spark, rows), "x", "y", 10.0, 6.0).collect()[0]
    nl, nr, b_l, b_r, tau, t = _hand(rows, 10.0, 6.0)
    assert (r.n_left, r.n_right) == (nl, nr)
    assert r.slope_left == pytest.approx(round(b_l, 6), abs=1e-9)
    assert r.slope_right == pytest.approx(round(b_r, 6), abs=1e-9)
    assert r.effect == pytest.approx(round(tau, 6), abs=1e-9)
    assert r.t_stat == pytest.approx(round(t, 6), abs=1e-9)


def test_planted_jump_recovered_and_null_is_zero(spark):
    jump = [
        (x, 1.5 * x + (8.0 if x >= 20 else 0.0))
        for x in range(10, 31)
    ]
    r = rdd_sharp(_df(spark, jump), "x", "y", 20.0, 10.0).collect()[0]
    # exactly linear both sides: intercepts recover the jump exactly,
    # and with SSE = 0 there is no noise to test against -> t NULL
    assert r.effect == pytest.approx(8.0, abs=1e-6)
    assert r.t_stat is None
    flat = [(x, 1.5 * x + ((x * 11) % 5) * 0.2) for x in range(10, 31)]
    r0 = rdd_sharp(_df(spark, flat), "x", "y", 20.0, 10.0).collect()[0]
    assert abs(r0.effect) < 1.0
    assert r0.t_stat is not None


def test_band_edges(spark):
    """x = c belongs to the RIGHT side; x = c-h and x = c+h are in,
    x just outside is not."""
    rows = [(9.0, 1.0), (10.0, 2.0), (15.0, 3.0), (21.0, 9.0),
            (15.5, 3.1), (14.5, 2.9), (25.0, 4.0), (25.5, 9.9),
            (9.5, 1.1), (4.0, 0.5), (3.9, 9.9)]
    r = rdd_sharp(_df(spark, rows), "x", "y", 10.0, 6.0).collect()[0]
    # left: [4, 10) -> 4.0, 9.0, 9.5 ; right: [10, 16] -> 10,14.5,15,15.5
    assert (r.n_left, r.n_right) == (3, 4)


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (10 + (i % 21), ((i * 13) % 29) + 0.25 * (i % 4))
        for i in range(120)
    ]
    r = rdd_sharp(_df(spark, rows), "x", "y", 20.0, 8.0).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (x DOUBLE, y DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)",
        [(float(x), float(y)) for x, y in rows],
    )
    row = con.execute(
        rdd_sharp_sql("SELECT x, y FROM t0", "x", "y", 20.0, 8.0)
    ).fetchone()
    assert row == (
        r.n_left, r.n_right, r.slope_left, r.slope_right,
        r.effect, r.t_stat,
    )
