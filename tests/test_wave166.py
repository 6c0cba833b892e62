"""Wave 166 — Hotelling T² multivariate control chart.

Hand-pinned T² recomputation from the definitional covariance
inverse, the joint-direction property (a day with individually-normal
but jointly-contrarian counts signals on T² while both univariate
z-scores stay small), and SQL-twin equality. Spec:
hotelling_t2_daily (plans/timeseries_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    hotelling_t2_chart,
    hotelling_t2_chart_sql,
)

_D0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events(spark, days):
    """days: list of (clicks, purchases) per day."""
    rows = []
    for i, (c, p) in enumerate(days):
        ts = _D0 + dt.timedelta(days=i)
        rows += [(ts + dt.timedelta(seconds=j), "click") for j in range(c)]
        rows += [
            (ts + dt.timedelta(seconds=5000 + j), "purchase")
            for j in range(p)
        ]
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


def _hand(days):
    n = len(days)
    xs = [c for c, _ in days]
    ys = [p for _, p in days]
    mx, my = sum(xs) / n, sum(ys) / n
    a = sum((x - mx) ** 2 for x in xs) / (n - 1)
    b = sum((y - my) ** 2 for y in ys) / (n - 1)
    c = sum((x - mx) * (y - my) for x, y in days) / (n - 1)
    det = a * b - c * c
    out = []
    for x, y in days:
        dx, dy = x - mx, y - my
        t2 = (b * dx * dx - 2 * c * dx * dy + a * dy * dy) / det
        out.append(round(t2, 6))
    return out


def test_hand_recomputation(spark):
    days = [(20 + (i * 7) % 9, 5 + (i * 3) % 4) for i in range(15)]
    got = hotelling_t2_chart(_events(spark, days)).collect()
    hand = _hand(days)
    assert [r.t2 for r in got] == pytest.approx(hand, abs=1e-6)
    assert [r.n_a for r in got] == [c for c, _ in days]


def test_joint_anomaly_signals_where_univariate_does_not(spark):
    """Strongly correlated pair; one day flips the correlation with
    both coordinates inside their own marginal ranges."""
    base = [(20 + i % 6, 10 + (i % 6)) for i in range(24)]  # y tracks x
    days = base + [(25, 10)]  # x high-normal, y low-normal: contrarian
    got = hotelling_t2_chart(_events(spark, days)).collect()
    t2s = [r.t2 for r in got]
    contrarian = t2s[-1]
    assert contrarian == max(t2s)
    assert got[-1].signal
    # both coordinates individually within the observed marginal range
    assert 20 <= 25 <= 25 and 10 <= 10 <= 15
    # univariate z-scores stay unremarkable (< 2)
    xs = [c for c, _ in days]
    ys = [p for _, p in days]
    zx = abs(25 - sum(xs) / len(xs)) / (
        math.sqrt(sum((x - sum(xs) / len(xs)) ** 2 for x in xs)
                  / (len(xs) - 1))
    )
    zy = abs(10 - sum(ys) / len(ys)) / (
        math.sqrt(sum((y - sum(ys) / len(ys)) ** 2 for y in ys)
                  / (len(ys) - 1))
    )
    assert zx < 2 and zy < 2


def test_sql_twin_matches_spark_exactly(spark):
    days = [((i * 13) % 30 + 10, (i * 5) % 12 + 3) for i in range(40)]
    r = hotelling_t2_chart(_events(spark, days)).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE events (ts TIMESTAMP, event_type VARCHAR)")
    rows = []
    for i, (c, p) in enumerate(days):
        ts = _D0 + dt.timedelta(days=i)
        rows += [(ts + dt.timedelta(seconds=j), "click") for j in range(c)]
        rows += [
            (ts + dt.timedelta(seconds=5000 + j), "purchase")
            for j in range(p)
        ]
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    got = con.execute(hotelling_t2_chart_sql("events")).fetchall()
    assert got == [
        (x.day, x.n_a, x.n_b, x.t2, x.signal) for x in r
    ]
