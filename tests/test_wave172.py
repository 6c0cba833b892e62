"""Wave 172 — negation-pattern funnel (A -> B with no C between).

Hand-built event sequences covering every outcome class (clean,
blocked, expired, blocker-after-goal = still clean, blocker-at-goal-
timestamp = still clean by the strictly-between contract, blocker
BEFORE the start = irrelevant), per-user isolation, and SQL-twin
equality. Spec: clean_conversion_funnel (plans/timeseries_specs.py),
gated in tests/test_contract.py.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    negation_pattern_funnel,
    negation_pattern_funnel_sql,
)

_D0 = dt.datetime(2024, 6, 1, 9, 0, 0)


def _ev(uid, minutes, etype):
    return (uid, _D0 + dt.timedelta(minutes=minutes), etype)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_outcome_classes(spark):
    rows = [
        # u1: clean conversion (click 0, purchase 10)
        _ev(1, 0, "click"), _ev(1, 10, "purchase"),
        # u2: blocked (click 0, error 5, purchase 10)
        _ev(2, 0, "click"), _ev(2, 5, "error"), _ev(2, 10, "purchase"),
        # u3: expired (click 0, purchase 40 > 30min)
        _ev(3, 0, "click"), _ev(3, 40, "purchase"),
        # u4: blocker AFTER the goal -> clean
        _ev(4, 0, "click"), _ev(4, 8, "purchase"), _ev(4, 9, "error"),
        # u5: blocker BEFORE the start -> irrelevant, clean
        _ev(5, 0, "error"), _ev(5, 1, "click"), _ev(5, 6, "purchase"),
        # u6: no purchase at all -> expired
        _ev(6, 0, "click"), _ev(6, 2, "view"),
    ]
    r = negation_pattern_funnel(_df(spark, rows)).collect()[0]
    assert (r.n_starts, r.n_clean, r.n_blocked, r.n_expired) == (
        6, 3, 1, 2
    )
    assert r.clean_rate == pytest.approx(0.5, abs=1e-9)
    assert r.blocked_rate == pytest.approx(round(1 / 6, 6), abs=1e-9)


def test_blocker_at_goal_timestamp_is_clean(spark):
    """Strictly-between contract: a blocker at EXACTLY the goal's
    timestamp does not block (nb < ng is false)."""
    rows = [
        _ev(1, 0, "click"), _ev(1, 10, "purchase"),
    ]
    rows.append((1, _D0 + dt.timedelta(minutes=10), "error"))
    r = negation_pattern_funnel(_df(spark, rows)).collect()[0]
    assert (r.n_clean, r.n_blocked) == (1, 0)


def test_per_user_isolation(spark):
    """u2's error must not block u1's conversion."""
    rows = [
        _ev(1, 0, "click"), _ev(1, 10, "purchase"),
        _ev(2, 5, "error"),
    ]
    r = negation_pattern_funnel(_df(spark, rows)).collect()[0]
    assert (r.n_starts, r.n_clean, r.n_blocked) == (1, 1, 0)


def test_sql_twin_matches_spark_exactly(spark):
    rows = []
    for u in range(1, 30):
        rows.append(_ev(u, 0, "click"))
        if u % 3 == 0:
            rows.append(_ev(u, u % 7 + 2, "error"))
        if u % 4 != 0:
            rows.append(_ev(u, u % 25 + 5, "purchase"))
    r = negation_pattern_funnel(_df(spark, rows)).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (user_id BIGINT, ts TIMESTAMP,"
        " event_type VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    row = con.execute(negation_pattern_funnel_sql("events")).fetchone()
    assert row == (
        r.n_starts, r.n_clean, r.n_blocked, r.n_expired,
        r.clean_rate, r.blocked_rate,
    )
