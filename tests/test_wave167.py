"""Wave 167 — Aalen-Johansen competing-risks cumulative incidence.

Hand-pinned CIF recomputation from the definitional sum, the tiling
identity CIF_a + CIF_b + S = 1 at every event time, the
overstatement property (naive 1 - KM-with-competitor-censored
exceeds the AJ CIF in the presence of competition), first-cause
tie-breaking (same-day A and B goes to A by the <= convention), and
SQL-twin equality. Spec: aalen_johansen_purchase_error
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from mcas_question2_etl_spark.operators.survival import (
    aalen_johansen_cif,
    aalen_johansen_cif_sql,
)

_D0 = dt.datetime(2024, 5, 1, 10, 0, 0)


def _events(spark, users):
    """users: (uid, days_to_a or None, days_to_b or None)."""
    rows = []
    for uid, ta, tb in users:
        rows.append((uid, _D0, "signup"))
        if ta is not None:
            rows.append((uid, _D0 + dt.timedelta(days=ta), "purchase"))
        if tb is not None:
            rows.append((uid, _D0 + dt.timedelta(days=tb), "error"))
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def _hand(users):
    lifetimes = []
    nc = 0
    for _, ta, tb in users:
        if ta is not None and (tb is None or ta <= tb):
            lifetimes.append((ta, "a"))
        elif tb is not None:
            lifetimes.append((tb, "b"))
        else:
            nc += 1
    times = sorted({t for t, _ in lifetimes})
    out = []
    s = 1.0
    cif_a = cif_b = 0.0
    remaining = len(lifetimes) + nc
    consumed = 0
    for t in times:
        da = sum(1 for tt, c in lifetimes if tt == t and c == "a")
        db = sum(1 for tt, c in lifetimes if tt == t and c == "b")
        n_risk = len(lifetimes) - consumed + nc
        cif_a += s * da / n_risk
        cif_b += s * db / n_risk
        s *= 1 - (da + db) / n_risk
        consumed += da + db
        out.append(
            (t, n_risk, da, db, round(s, 6), round(cif_a, 6),
             round(cif_b, 6))
        )
    return out


def _users():
    users = []
    for i in range(40):
        ta = (i * 7) % 15 + 1 if i % 3 != 0 else None
        tb = (i * 5) % 12 + 1 if i % 4 != 0 else None
        users.append((i, ta, tb))
    return users


def test_hand_recomputation_and_tiling(spark):
    users = _users()
    got = aalen_johansen_cif(_events(spark, users)).collect()
    hand = _hand(users)
    assert [
        (r.t_days, r.n_risk, r.d_a, r.d_b, r.surv_any, r.cif_a, r.cif_b)
        for r in got
    ] == hand
    for r in got:
        assert r.cif_a + r.cif_b + r.surv_any == pytest.approx(
            1.0, abs=2e-6
        )


def test_naive_km_overstates_under_competition(spark):
    users = _users()
    got = aalen_johansen_cif(_events(spark, users)).collect()
    # naive: treat cause-b users as censored-at-event -> 1 - KM_a
    lifetimes = []
    nc = 0
    for _, ta, tb in users:
        if ta is not None and (tb is None or ta <= tb):
            lifetimes.append((ta, True))
        elif tb is not None:
            lifetimes.append((tb, False))  # competitor, naively censored
        else:
            nc += 1
    s = 1.0
    consumed = 0
    naive = {}
    for t in sorted({t for t, _ in lifetimes}):
        da = sum(1 for tt, e in lifetimes if tt == t and e)
        n_risk = len(lifetimes) - consumed + nc
        if da:
            s *= 1 - da / n_risk
        consumed += sum(1 for tt, _ in lifetimes if tt == t)
        naive[t] = 1 - s
    last = got[-1]
    assert naive[last.t_days] > last.cif_a  # strict overstatement


def test_same_day_tie_goes_to_cause_a(spark):
    users = [(1, 3, 3), (2, None, 5), (3, 8, None)]
    got = aalen_johansen_cif(_events(spark, users)).collect()
    by_t = {r.t_days: r for r in got}
    assert by_t[3].d_a == 1 and by_t[3].d_b == 0


def test_sql_twin_matches_spark_exactly(spark):
    users = _users()
    r = aalen_johansen_cif(_events(spark, users)).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (user_id BIGINT, ts TIMESTAMP,"
        " event_type VARCHAR)"
    )
    rows = []
    for uid, ta, tb in users:
        rows.append((uid, _D0, "signup"))
        if ta is not None:
            rows.append((uid, _D0 + dt.timedelta(days=ta), "purchase"))
        if tb is not None:
            rows.append((uid, _D0 + dt.timedelta(days=tb), "error"))
    con.executemany("INSERT INTO events VALUES (?, ?, ?)", rows)
    got = con.execute(aalen_johansen_cif_sql()).fetchall()
    assert got == [
        (x.t_days, x.n_risk, x.d_a, x.d_b, x.surv_any, x.cif_a, x.cif_b)
        for x in r
    ]


def test_total_extinction_pins_survival_to_zero(spark):
    """Every user dies at an observed time (no censoring): the final
    S must be EXACTLY 0 (ln(0) path) and the CIFs tile to 1."""
    users = [(1, 2, None), (2, 4, None), (3, None, 4), (4, 6, None)]
    got = aalen_johansen_cif(_events(spark, users)).collect()
    last = got[-1]
    assert last.surv_any == 0.0
    assert last.cif_a + last.cif_b == pytest.approx(1.0, abs=2e-6)
