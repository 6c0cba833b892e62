"""Wave-107 hand pins: Prais-Winsten AR(1) GLS and the
Pesaran-Timmermann directional-accuracy test. PW against a
plain-Python two-step reference on simulated AR(1) errors (rho
recovered, PW slope matches; iid errors collapse PW to OLS); PT
against a definition reference plus the persistent (skill) and
alternating (anti-skill) poles.

Covered spec names: prais_winsten_daily, pesaran_timmermann_momentum.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.regression import (
    pesaran_timmermann,
    prais_winsten,
)


def _daily_df(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "day int, y double"
    )


def _pw_ref(ys):
    y0 = np.asarray(ys, dtype=float)
    n = len(y0)
    t = np.arange(1, n + 1, dtype=float)
    y = y0 * n / y0.sum()
    mt, my = t.mean(), y.mean()
    b_ols = ((t - mt) * (y - my)).sum() / ((t - mt) ** 2).sum()
    e = y - my - b_ols * (t - mt)
    rho = (e[1:] * e[:-1]).sum() / (e[:-1] ** 2).sum()
    s = math.sqrt(1.0 - rho * rho)
    ys_ = np.concatenate([[y[0] * s], y[1:] - rho * y[:-1]])
    xs_ = np.concatenate([[t[0] * s], t[1:] - rho * (t[1:] - 1.0)])
    cs_ = np.concatenate([[s], np.full(n - 1, 1.0 - rho)])
    X = np.column_stack([cs_, xs_])
    coef, *_ = np.linalg.lstsq(X, ys_, rcond=None)
    return rho, b_ols, coef[1], coef[0]


def test_pw_recovers_ar1_and_matches_reference(spark):
    rng = np.random.RandomState(7)
    n = 400
    e = np.zeros(n)
    for i in range(1, n):
        e[i] = 0.7 * e[i - 1] + rng.randn()
    ys = 200.0 + 0.5 * np.arange(n) + 8.0 * e
    out = prais_winsten(_daily_df(spark, ys)).collect()[0]
    rho, b_ols, b_pw, a_pw = _pw_ref(ys)
    assert out.n_days == n
    assert out.rho == pytest.approx(rho, abs=1e-6)
    assert out.rho > 0.5  # the planted AR(1) shows
    assert out.slope_ols == pytest.approx(b_ols, abs=1e-6)
    assert out.slope_pw == pytest.approx(b_pw, abs=1e-6)
    assert out.intercept_pw == pytest.approx(a_pw, abs=1e-6)


def test_pw_iid_errors_collapse_to_ols(spark):
    rng = np.random.RandomState(3)
    ys = 100.0 + 2.0 * np.arange(300) + rng.randn(300)
    out = prais_winsten(_daily_df(spark, ys)).collect()[0]
    assert abs(out.rho) < 0.15
    assert out.slope_pw == pytest.approx(out.slope_ols, rel=0.02)


def _pt_ref(ys):
    d = np.diff(np.asarray(ys, dtype=float))
    a = (d[1:] > 0).astype(int)
    f = (d[:-1] > 0).astype(int)
    n = len(a)
    p_hat = (a == f).mean()
    pa, pf = a.mean(), f.mean()
    p_star = pa * pf + (1 - pa) * (1 - pf)
    v_hat = p_star * (1 - p_star) / n
    v_star = (
        (2 * pf - 1) ** 2 * pa * (1 - pa) / n
        + (2 * pa - 1) ** 2 * pf * (1 - pf) / n
        + 4 * pa * pf * (1 - pa) * (1 - pf) / n**2
    )
    return n, p_hat, p_star, (p_hat - p_star) / math.sqrt(v_hat - v_star)


def test_pt_matches_reference(spark):
    rng = np.random.RandomState(19)
    ys = np.cumsum(rng.randn(500)).tolist()
    out = pesaran_timmermann(_daily_df(spark, ys)).collect()[0]
    n, p_hat, p_star, pt = _pt_ref(ys)
    assert out.n_pairs == n
    assert out.hit_rate == pytest.approx(p_hat, abs=1e-6)
    assert out.p_star == pytest.approx(p_star, abs=1e-6)
    assert out.pt_stat == pytest.approx(pt, abs=1e-5)


def test_pt_persistent_signs_show_skill(spark):
    # long runs up then down: yesterday's direction predicts today's
    ys = list(range(100)) + list(range(100, 0, -1)) + list(range(0, 80))
    out = pesaran_timmermann(
        _daily_df(spark, [float(v) for v in ys])
    ).collect()[0]
    assert out.hit_rate > 0.9
    assert out.pt_stat > 2.33


def test_pt_alternating_is_antiskill(spark):
    ys = [10.0 + (i % 2) for i in range(200)]
    out = pesaran_timmermann(_daily_df(spark, ys)).collect()[0]
    assert out.hit_rate == pytest.approx(0.0, abs=1e-9)
    assert out.pt_stat < -2.33
