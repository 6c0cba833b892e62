"""Wave-93 hand pins: restricted mean survival time and Qini uplift
deciles. RMST is recomputed by literally integrating a hand-built KM
step function (and cross-checked against the operator's own KM table);
the Qini table against a plain-Python cumulative walk, including the
known-score sanity direction (a score that targets true responders
concentrates uplift in early deciles).

Covered spec names: rmst_retention, qini_uplift_deciles.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.evaluation import (
    qini_uplift_deciles,
)
from mcas_question2_etl_spark.operators.survival import kaplan_meier, rmst


def _events_df(spark, user_days):
    """user_days: {user_id: (first_day, last_day)} — two events per
    user on those days (day 0 = 2024-01-01)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, (fd, ld) in user_days.items():
        for d in {fd, ld}:
            rows.append(
                (eid, t0 + dt.timedelta(days=d), uid, "view", 1.0, "{}")
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_rmst_integrates_km_steps_exactly(spark):
    # horizon = day 30; censor_days=7 -> users ending after day 23 are
    # censored. lifetimes: u1: 5 (obs), u2: 10 (obs), u3: 30 (censored
    # ender), u4: 2 (obs), u5: 28 (censored)
    users = {1: (0, 5), 2: (0, 10), 3: (0, 30), 4: (3, 5), 5: (0, 28)}
    ev = _events_df(spark, users)
    km = {r.t_days: r for r in kaplan_meier(ev, censor_days=7).collect()}
    out = rmst(ev, censor_days=7, tau=14).collect()[0]
    # integrate the step function by hand from the operator's KM table
    times = sorted(t for t in km if t <= 14)
    area, prev_t, prev_s = 0.0, 0, 1.0
    for t in times:
        area += prev_s * (t - prev_t)
        prev_t, prev_s = t, km[t].survival
    area += prev_s * (14 - prev_t)
    assert out.tau_days == 14
    assert out.n_event_times == len(times)
    assert out.rmst_days == pytest.approx(area, abs=1e-6)
    assert out.survival_at_tau == pytest.approx(prev_s, abs=1e-6)
    # bounds: 0 < RMST <= tau, and below tau when events exist
    assert 0.0 < out.rmst_days < 14.0


def test_rmst_no_events_returns_tau(spark):
    # all users censored (every lifetime ends at the horizon)
    users = {1: (0, 30), 2: (0, 30)}
    out = rmst(_events_df(spark, users), censor_days=7, tau=14).collect()[0]
    assert out.n_event_times == 0
    assert out.rmst_days == 14.0
    assert out.survival_at_tau == 1.0


def _units_df(spark, rows):
    return spark.createDataFrame(
        rows, "unit_id long, t int, y int, score double"
    )


def _qini_ref(rows, n_buckets):
    ordered = sorted(rows, key=lambda r: (-r[3], r[0]))
    n = len(ordered)
    # NTILE semantics: first (n % k) buckets get ceil(n/k)
    base, extra = divmod(n, n_buckets)
    out, idx = [], 0
    cum = dict(nt=0, nc=0, yt=0, yc=0)
    for b in range(1, n_buckets + 1):
        size = base + (1 if b <= extra else 0)
        for r in ordered[idx : idx + size]:
            if r[1] == 1:
                cum["nt"] += 1
                cum["yt"] += r[2]
            else:
                cum["nc"] += 1
                cum["yc"] += r[2]
        idx += size
        uplift = cum["yt"] / cum["nt"] - cum["yc"] / cum["nc"]
        qini = cum["yt"] - cum["yc"] * cum["nt"] / cum["nc"]
        out.append((b, cum["nt"], cum["nc"], cum["yt"], cum["yc"], uplift, qini))
    return out


def test_qini_matches_python_cumulative_walk(spark):
    import numpy as np

    rng = np.random.RandomState(13)
    rows = []
    for uid in range(200):
        t = uid % 2
        score = float(rng.rand())
        # responders: treated units with high score convert more
        p = 0.2 + (0.5 * score if t == 1 else 0.0)
        y = int(rng.rand() < p)
        rows.append((uid, t, y, score))
    out = qini_uplift_deciles(_units_df(spark, rows)).collect()
    ref = _qini_ref(rows, 10)
    assert len(out) == 10
    for got, want in zip(out, ref):
        assert got.bucket == want[0]
        assert (got.n_treat, got.n_control) == (want[1], want[2])
        assert (got.conv_treat, got.conv_control) == (want[3], want[4])
        assert got.uplift_at_k == pytest.approx(want[5], abs=1e-6)
        assert got.qini_at_k == pytest.approx(want[6], abs=1e-6)
    # the score genuinely targets: early-decile uplift beats the final
    # (population) uplift
    assert out[0].uplift_at_k > out[-1].uplift_at_k


def test_qini_flat_score_has_flat_uplift(spark):
    # constant outcome rates and a useless score: every decile's
    # cumulative uplift equals the population uplift
    rows = []
    for uid in range(400):
        t = uid % 2
        y = 1 if (uid // 2) % 4 == 0 else 0  # same 25% rate in both arms
        rows.append((uid, t, y, float(uid % 7)))
    out = qini_uplift_deciles(_units_df(spark, rows)).collect()
    ref = _qini_ref(rows, 10)
    for got, want in zip(out, ref):
        assert got.uplift_at_k == pytest.approx(want[5], abs=1e-6)
    assert out[-1].uplift_at_k == pytest.approx(0.0, abs=1e-6)
