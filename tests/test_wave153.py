"""Wave 153 — Holt-Winters additive seasonal backtest.

Hand-pinned recursion recomputation (pure-python fold with the same
seeds), seasonal-learning property (on a perfectly periodic series HW
converges to near-zero one-step error where Holt linear keeps paying
the seasonal swing every cycle), short-group dropping, and SQL-twin
equality. Spec: holt_winters_dow_backtest
(plans/timeseries_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    holt_linear_backtest,
    holt_winters_backtest,
    holt_winters_backtest_sql,
)

_D0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, counts_by_group):
    """counts_by_group: {group: [daily counts]} -> event rows."""
    rows = []
    for g, counts in counts_by_group.items():
        for day, c in enumerate(counts):
            for k in range(c):
                rows.append((g, _D0 + dt.timedelta(days=day, seconds=k)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def _hand(counts, a=0.5, b=0.1, g=0.3, p=7):
    xs = [float(c) for c in counts]
    m0 = sum(xs[:p]) / float(p)
    l, bb = m0, 0.0
    s = [x - m0 for x in xs[:p]]
    e, n = 0.0, 0
    for x in xs[p:]:
        idx = n % p
        f = l + bb + s[idx]
        lnew = a * (x - s[idx]) + (1 - a) * (l + bb)
        bb = b * (lnew - l) + (1 - b) * bb
        s[idx] = g * (x - lnew) + (1 - g) * s[idx]
        l = lnew
        e += abs(x - f)
        n += 1
    return e / n, l, bb, l + bb + s[n % p]


def test_hand_recomputation(spark):
    counts = [(i * 13) % 9 + 2 for i in range(20)]
    df = _events(spark, {"a": counts})
    r = holt_winters_backtest(df).collect()[0]
    mae, level, trend, nxt = _hand(counts)
    assert r.n_days == 20
    assert r.mae == pytest.approx(mae, abs=1e-12)
    assert r.level == pytest.approx(level, abs=1e-12)
    assert r.trend == pytest.approx(trend, abs=1e-12)
    assert r.forecast_next == pytest.approx(nxt, abs=1e-12)


def test_learns_weekly_season_where_holt_cannot(spark):
    """Perfectly periodic weekly pattern, 8 cycles: HW's one-step MAE
    collapses toward 0; Holt linear keeps absorbing the swing."""
    week = [20, 22, 25, 24, 23, 5, 3]
    counts = week * 8
    df = _events(spark, {"a": counts})
    hw = holt_winters_backtest(df).collect()[0]
    hl = holt_linear_backtest(df).collect()[0]
    assert hw.mae < 1.5
    assert hl.mae > 4 * hw.mae


def test_short_groups_dropped(spark):
    df = _events(spark, {"long": [5] * 10, "short": [5] * 6})
    rows = holt_winters_backtest(df).collect()
    assert [r.event_type for r in rows] == ["long"]


def test_sql_twin_matches_spark_exactly(spark):
    counts_by_group = {
        "a": [(i * 13) % 9 + 2 for i in range(25)],
        "b": [(i * 7) % 12 + 1 for i in range(18)],
    }
    df = _events(spark, counts_by_group)
    got = {
        r.event_type: r for r in holt_winters_backtest(df).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_type VARCHAR, ts TIMESTAMP)")
    rows = []
    for g, counts in counts_by_group.items():
        for day, c in enumerate(counts):
            for k in range(c):
                rows.append((g, _D0 + dt.timedelta(days=day, seconds=k)))
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    for g, n_days, mae, level, trend, nxt in con.execute(
        holt_winters_backtest_sql("events")
    ).fetchall():
        r = got[g]
        assert (r.n_days, r.mae, r.level, r.trend, r.forecast_next) == (
            n_days, mae, level, trend, nxt
        )
