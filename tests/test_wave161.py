"""Wave 161 — mSPRT always-valid A/B monitor.

Hand-pinned mixture-likelihood recomputation over cumulative daily
counts, the peeking-validity property pair (a genuine large effect
crosses with a first_sig_day; an A/A null keeps the always-valid p
high and never crosses), degenerate-day exclusion, and SQL-twin
equality. Spec: msprt_ab_always_valid (plans/timeseries_specs.py),
gated in tests/test_contract.py.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    msprt_ab_monitor,
    msprt_ab_monitor_sql,
)

_D0 = dt.datetime(2024, 1, 1, 9, 0, 0)


def _rows(day_specs):
    """day_specs: per day (nt, xt, nc, xc) -> event rows
    (ts, arm, y)."""
    rows = []
    for day, (nt, xt, nc, xc) in enumerate(day_specs):
        ts = _D0 + dt.timedelta(days=day)
        for j in range(nt):
            rows.append((ts + dt.timedelta(seconds=j), True, j < xt))
        for j in range(nc):
            rows.append(
                (ts + dt.timedelta(seconds=1000 + j), False, j < xc)
            )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, arm boolean, y boolean"
    )


def _hand(day_specs, tau=0.02, alpha=0.05):
    t2 = tau * tau
    cnt = cxt = cnc = cxc = 0
    best = 1.0
    first = None
    for i, (nt, xt, nc, xc) in enumerate(day_specs, 1):
        cnt, cxt, cnc, cxc = cnt + nt, cxt + xt, cnc + nc, cxc + xc
        if cnt == 0 or cnc == 0:
            continue
        pbar = (cxt + cxc) / (cnt + cnc)
        if not (0.0 < pbar < 1.0):
            continue
        v = pbar * (1 - pbar) * (1 / cnt + 1 / cnc)
        d = cxt / cnt - cxc / cnc
        lam = math.sqrt(v / (v + t2)) * math.exp(
            d * d * t2 / (2 * v * (v + t2))
        )
        p = 1 / lam
        if p <= alpha and first is None:
            first = i
        best = min(best, p)
    return len(day_specs), cnt, cnc, cxt, cxc, round(min(1.0, best), 6), first


def test_hand_recomputation(spark):
    specs = [(30, 10, 30, 6), (25, 9, 28, 5), (40, 15, 35, 7),
             (20, 8, 22, 4)]
    r = msprt_ab_monitor(_df(spark, _rows(specs)), "ts", "arm", "y").collect()[0]
    nd, cnt, cnc, cxt, cxc, p, first = _hand(specs)
    assert (r.n_days, r.n_treat, r.n_ctrl, r.x_treat, r.x_ctrl) == (
        nd, cnt, cnc, cxt, cxc
    )
    assert r.p_always_valid == pytest.approx(p, abs=1e-9)
    assert r.first_sig_day == first


def test_effect_crosses_null_does_not(spark):
    effect = [(100, 45, 100, 15)] * 8   # huge persistent lift
    null = [(100, 20, 100, 20)] * 8     # exact A/A
    re = msprt_ab_monitor(_df(spark, _rows(effect)), "ts", "arm", "y").collect()[0]
    rn = msprt_ab_monitor(_df(spark, _rows(null)), "ts", "arm", "y").collect()[0]
    assert re.p_always_valid < 0.01
    assert re.first_sig_day is not None
    assert rn.p_always_valid > 0.5
    assert rn.first_sig_day is None


def test_degenerate_days_excluded(spark):
    # day 1: control empty; day 2: all-zero outcomes -> pbar = 0;
    # day 3 first valid likelihood
    specs = [(10, 2, 0, 0), (5, 0, 5, 0), (30, 10, 30, 9)]
    r = msprt_ab_monitor(_df(spark, _rows(specs)), "ts", "arm", "y").collect()[0]
    hand = _hand(specs)
    assert r.p_always_valid == pytest.approx(hand[5], abs=1e-9)
    assert r.n_days == 3


def test_sql_twin_matches_spark_exactly(spark):
    specs = [((i * 7) % 40 + 10, (i * 5) % 8, (i * 11) % 35 + 12,
              (i * 3) % 7) for i in range(12)]
    rows = _rows(specs)
    r = msprt_ab_monitor(_df(spark, rows), "ts", "arm", "y").collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (ts TIMESTAMP, arm BOOLEAN, y BOOLEAN)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    row = con.execute(
        msprt_ab_monitor_sql("ev", "ts", "arm", "y")
    ).fetchone()
    assert row == (
        r.n_days, r.n_treat, r.n_ctrl, r.x_treat, r.x_ctrl,
        r.p_always_valid, r.first_sig_day,
    )
