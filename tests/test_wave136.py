"""Wave 136 — Croston's method + SBA for intermittent demand.

Hand-pinned tests for operators/timeseries.py croston_forecast: the
double SES recursion replayed step by step in Python, the constant-
demand fixed point, SBA de-biasing factor, the min_events filter and
zero-day exclusion, and exact SQL-twin equality (no rounding — the
fold is bit-identical by construction). Spec: croston_part_demand
(plans/timeseries_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    croston_forecast,
    croston_forecast_sql,
)

ALPHA = 0.2


def _df(spark, rows):
    return spark.createDataFrame(rows, "item long, day long, qty long")


def _hand(events, a=ALPHA):
    """events: [(day, z)] sorted. Returns (z_hat, p_hat)."""
    (d0, z0), rest = events[0], events[1:]
    zh, ph, pd = float(z0), None, d0
    for d, z in rest:
        zh = a * z + (1 - a) * zh
        ph = float(d - pd) if ph is None else a * (d - pd) + (1 - a) * ph
        pd = d
    return zh, ph


def test_recursion_replayed_by_hand(spark):
    ev = [(3, 5), (7, 2), (8, 9), (15, 4), (16, 1)]
    rows = [(1, d, z) for d, z in ev]
    r = croston_forecast(_df(spark, rows)).collect()[0]
    zh, ph = _hand(ev)
    assert r.n_demands == 5
    assert r.z_hat == pytest.approx(zh, abs=0)  # bit-exact fold
    assert r.p_hat == pytest.approx(ph, abs=0)
    assert r.croston_rate == pytest.approx(zh / ph, abs=0)
    assert r.sba_rate == pytest.approx((1 - ALPHA / 2) * zh / ph, abs=0)


def test_constant_demand_fixed_point(spark):
    """Same size every k days: z_hat stays at the size, p_hat at k,
    rate = size/k exactly."""
    rows = [(1, d, 6) for d in range(0, 40, 4)]
    r = croston_forecast(_df(spark, rows)).collect()[0]
    # IEEE: 0.2*6 + 0.8*6 = 6 + 1ulp (0.2/0.8 are not binary-exact),
    # so the fixed point holds to ulp accuracy, not equality
    assert r.z_hat == pytest.approx(6.0, abs=1e-12)
    assert r.p_hat == pytest.approx(4.0, abs=1e-12)
    assert r.croston_rate == pytest.approx(1.5, abs=1e-12)
    assert r.sba_rate == pytest.approx(0.9 * 1.5, abs=1e-12)


def test_zero_days_excluded_and_min_events(spark):
    rows = [
        (1, 0, 5), (1, 1, 0), (1, 2, 3), (1, 9, 4),  # zeros dropped
        (2, 0, 7), (2, 3, 1),  # only 2 demand days -> filtered
    ]
    out = {r.item: r for r in croston_forecast(_df(spark, rows)).collect()}
    assert set(out) == {1}
    assert out[1].n_demands == 3


def test_same_day_demands_aggregate(spark):
    """Two lines on the same (item, day) are one demand event with the
    summed size."""
    rows = [(1, 0, 2), (1, 0, 3), (1, 4, 1), (1, 6, 1)]
    r = croston_forecast(_df(spark, rows)).collect()[0]
    assert r.n_demands == 3
    zh, ph = _hand([(0, 5), (4, 1), (6, 1)])
    assert r.z_hat == pytest.approx(zh, abs=0)
    assert r.p_hat == pytest.approx(ph, abs=0)


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (k, (j * j * 3 + k) % 60, 1 + (k * 7 + j) % 9)
        for k in range(6)
        for j in range(10)
    ]
    s = [tuple(r) for r in croston_forecast(_df(spark, rows)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (item BIGINT, day BIGINT, qty BIGINT)")
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", rows)
    d = con.execute(
        croston_forecast_sql("SELECT * FROM t0")
    ).fetchall()
    assert s == d
