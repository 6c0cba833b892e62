"""Wave 162 — TSB intermittent-demand forecast.

Hand-pinned recursion (dense per-period recursion in pure python must
equal the gap-closed-form fold), the obsolescence property Croston
cannot express (two identical demand histories, one ending long
before the table's last day — TSB decays it, Croston does not), and
SQL-twin equality. Spec: tsb_part_demand
(plans/timeseries_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    croston_forecast,
    tsb_forecast,
    tsb_forecast_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "item string, day long, qty long"
    )


def _hand_dense(events, dmax, a=0.2, b=0.1):
    """Dense per-period TSB from the first demand day to dmax —
    the definitional recursion the closed-form fold must match."""
    demand = dict(events)
    d0 = min(demand)
    z = float(demand[d0])
    p = 1.0
    for d in range(d0 + 1, dmax + 1):
        q = demand.get(d, 0)
        if q > 0:
            p = b + (1 - b) * p
            z = a * q + (1 - a) * z
        else:
            p = (1 - b) * p
    return round(z, 6), round(p, 6), round(p * z, 6)


def test_gap_closed_form_matches_dense_recursion(spark):
    events = [(3, 4), (7, 2), (8, 6), (15, 3), (30, 5)]
    dmax = 40
    rows = [("a", d, q) for d, q in events] + [("pad", dmax, 1)] * 3
    r = {
        x.item: x
        for x in tsb_forecast(_df(spark, rows), min_events=3).collect()
    }["a"]
    z, p, rate = _hand_dense(events, dmax)
    assert r.n_demands == 5
    assert (r.z_hat, r.p_hat, r.tsb_rate) == (z, p, rate)


def test_obsolete_part_decays_where_croston_does_not(spark):
    live = [(d, 3) for d in range(1, 61, 5)]          # through day 56
    dead = [(d, 3) for d in range(1, 31, 5)]          # stops day 26
    rows = (
        [("live", d, q) for d, q in live]
        + [("dead", d, q) for d, q in dead]
    )
    tsb = {x.item: x for x in tsb_forecast(_df(spark, rows)).collect()}
    cro = {
        x.item: x for x in croston_forecast(_df(spark, rows)).collect()
    }
    # identical cadence and sizes -> croston rates match exactly
    assert cro["dead"].croston_rate == pytest.approx(
        cro["live"].croston_rate, rel=1e-9
    )
    # TSB: the dead part's 30-day silent tail crushes its rate
    assert tsb["dead"].tsb_rate < 0.3 * tsb["live"].tsb_rate
    assert tsb["dead"].z_hat == tsb["live"].z_hat  # sizes identical


def test_min_events_filter(spark):
    rows = [("a", 1, 2), ("a", 5, 2), ("a", 9, 2), ("b", 3, 1)]
    out = tsb_forecast(_df(spark, rows), min_events=3).collect()
    assert [r.item for r in out] == ["a"]


def test_sql_twin_matches_spark_exactly(spark):
    rows = []
    for k in range(1, 7):
        for j in range(1, 8):
            d = (j * (k + 3) * 3) % 90 + 1
            rows.append((f"p{k}", d, (j * k) % 5 + 1))
    r = tsb_forecast(_df(spark, rows)).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t0 (item VARCHAR, day BIGINT, qty BIGINT)"
    )
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", rows)
    got = con.execute(
        tsb_forecast_sql("SELECT * FROM t0")
    ).fetchall()
    assert got == [
        (x.item, x.n_demands, x.z_hat, x.p_hat, x.tsb_rate) for x in r
    ]
