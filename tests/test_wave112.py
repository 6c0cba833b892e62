"""Wave-112 hand pins: Inclán-Tiao CUSUM of squares and the
Kaplan-Meier Greenwood log-log band. CUSUM-sq against a plain-Python
reference with a planted variance break (location recovered, stat
above the 1% Brownian-bridge value) and the homoskedastic null;
Greenwood against a hand-rolled lifelines-style reference on a tiny
hand-built cohort, including the coverage ordering lo < S < hi and
the NULL convention at S = 1 or 0.

Covered spec names: cusum_squares_daily, km_greenwood_bands.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.survival import km_greenwood_ci
from mcas_question2_etl_spark.operators.timeseries import cusum_squares

_Z = 1.959963984540054


def _daily_df(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "day int, y double"
    )


def _it_ref(ys):
    y = np.asarray(ys, dtype=float)
    e = y - y.mean()
    c = np.cumsum(e * e)
    n = len(y)
    d = np.abs(c / c[-1] - np.arange(1, n + 1) / n)
    k = int(np.argmax(d))
    return k, d[k], math.sqrt(n / 2.0) * d[k]


def test_cusum_sq_finds_planted_variance_break(spark):
    rng = np.random.RandomState(11)
    ys = np.concatenate(
        [100 + rng.randn(250), 100 + 6.0 * rng.randn(250)]
    )
    out = cusum_squares(_daily_df(spark, ys)).collect()[0]
    k, dmax, stat = _it_ref(ys)
    assert out.break_day == k
    assert out.d_max == pytest.approx(dmax, abs=1e-6)
    assert out.it_stat == pytest.approx(stat, abs=1e-5)
    assert out.it_stat > 1.628  # 1% critical value
    assert 200 <= out.break_day <= 300  # near the true break at 250


def test_cusum_sq_homoskedastic_null(spark):
    rng = np.random.RandomState(7)
    ys = 50 + 2.0 * rng.randn(500)
    out = cusum_squares(_daily_df(spark, ys)).collect()[0]
    _, _, stat = _it_ref(ys)
    assert out.it_stat == pytest.approx(stat, abs=1e-5)
    assert out.it_stat < 1.358  # 5% critical value


def _events_df(spark, lifetimes, horizon_days=30):
    # user u first event at day 0, last at day lifetimes[u]; one
    # extra long-lived user pins the horizon
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for u, lt in enumerate(lifetimes):
        rows.append((u, base))
        rows.append((u, base + dt.timedelta(days=lt)))
    rows.append((9999, base))
    rows.append((9999, base + dt.timedelta(days=horizon_days)))
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _greenwood_ref(lifetimes, horizon_days=30, censor_days=7):
    lts = list(lifetimes) + [horizon_days]
    obs = [1 if lt <= horizon_days - censor_days else 0 for lt in lts]
    times = sorted({lt for lt, o in zip(lts, obs) if o})
    out = {}
    s = 1.0
    v = 0.0
    for t in times:
        n_risk = sum(1 for lt in lts if lt >= t)
        d = sum(1 for lt, o in zip(lts, obs) if lt == t and o)
        s *= 1.0 - d / n_risk
        v += d / (n_risk * (n_risk - d))
        if 0 < s < 1:
            lo = s ** math.exp(-_Z * math.sqrt(v) / math.log(s))
            hi = s ** math.exp(_Z * math.sqrt(v) / math.log(s))
        else:
            lo = hi = None
        out[t] = (n_risk, d, s, s * math.sqrt(v), lo, hi)
    return out


def test_greenwood_matches_reference(spark):
    lifetimes = [3, 3, 5, 8, 8, 8, 12, 15, 20, 26]
    df = _events_df(spark, lifetimes)
    out = km_greenwood_ci(df).collect()
    ref = _greenwood_ref(lifetimes)
    assert {r.t_days for r in out} == set(ref)
    for r in out:
        n_risk, d, s, se, lo, hi = ref[r.t_days]
        assert r.n_risk == n_risk
        assert r.n_events == d
        assert r.survival == pytest.approx(s, abs=1e-6)
        assert r.se_greenwood == pytest.approx(se, abs=1e-6)
        if lo is None:
            assert r.ci_lo is None and r.ci_hi is None
        else:
            assert r.ci_lo == pytest.approx(lo, abs=1e-6)
            assert r.ci_hi == pytest.approx(hi, abs=1e-6)
            assert r.ci_lo < r.survival < r.ci_hi


def test_greenwood_terminal_zero_is_null(spark):
    # every tracked user churns observed; the last event time drives
    # S to 0 -> NULL band, not a log blow-up
    lifetimes = [2, 4, 6]
    df = _events_df(spark, lifetimes, horizon_days=30)
    out = sorted(
        km_greenwood_ci(df).collect(), key=lambda r: r.t_days
    )
    # the horizon user (lifetime 30 > 23) is censored, so S stays > 0
    assert all(r.survival > 0 for r in out)
    assert all(r.ci_lo is not None for r in out)
