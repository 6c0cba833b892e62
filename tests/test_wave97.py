"""Wave-97 hand pins: White heteroskedasticity test and Ramsey RESET.
White against a numpy lstsq reference of the auxiliary regression
(and the U-shaped-variance case Breusch-Pagan's linear auxiliary is
blind to); RESET against the CANONICAL fitted-value-powers form
computed with numpy — verifying the documented span-equivalence of
the polynomial basis the operator actually uses — plus the
pure-linear (small F) and quadratic (huge F) poles.

Covered spec names: white_test_daily, ramsey_reset_daily.
"""

from __future__ import annotations

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.regression import (
    ramsey_reset,
    white_test,
)


def _daily_df(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "day int, y double"
    )


def _prep(ys):
    n = len(ys)
    t = np.arange(1, n + 1, dtype=float)
    u = (2.0 * t - n - 1.0) / (n - 1.0)
    y = np.asarray(ys, dtype=float)
    yn = y * n / y.sum()
    return u, yn


def _white_ref(ys):
    u, yn = _prep(ys)
    n = len(ys)
    X = np.column_stack([np.ones(n), u])
    beta, *_ = np.linalg.lstsq(X, yn, rcond=None)
    g = (yn - X @ beta) ** 2
    Z = np.column_stack([np.ones(n), u, u * u])
    gb, *_ = np.linalg.lstsq(Z, g, rcond=None)
    fitted = Z @ gb
    r2 = 1.0 - ((g - fitted) ** 2).sum() / ((g - g.mean()) ** 2).sum()
    return r2, n * r2


def _reset_ref_canonical(ys):
    # the textbook form: add powers of the FITTED VALUES yhat^2, yhat^3
    u, yn = _prep(ys)
    n = len(ys)
    X = np.column_stack([np.ones(n), u])
    beta, *_ = np.linalg.lstsq(X, yn, rcond=None)
    yhat = X @ beta
    rss_base = ((yn - yhat) ** 2).sum()
    Xf = np.column_stack([np.ones(n), u, yhat**2, yhat**3])
    bf, *_ = np.linalg.lstsq(Xf, yn, rcond=None)
    rss_full = ((yn - Xf @ bf) ** 2).sum()
    return ((rss_base - rss_full) / 2.0) / (rss_full / (n - 4.0))


def test_white_matches_reference_heteroskedastic(spark):
    # variance swelling at BOTH ends (prop. to u^2): BP's linear
    # auxiliary cannot see it, White's quadratic term must
    rng = np.random.RandomState(5)
    n = 200
    t = np.arange(1, n + 1, dtype=float)
    u = (2.0 * t - n - 1.0) / (n - 1.0)
    ys = 100.0 + 3.0 * t + (0.5 + 20.0 * u * u) * rng.randn(n)
    out = white_test(_daily_df(spark, ys)).collect()[0]
    r2, lm = _white_ref(ys)
    assert out.n_days == n
    assert out.r2_aux == pytest.approx(r2, abs=1e-6)
    assert out.lm_stat == pytest.approx(lm, abs=1e-4)
    assert out.lm_stat > 9.21  # chi2(2) @ 1%


def test_white_homoskedastic_small(spark):
    rng = np.random.RandomState(9)
    ys = 50.0 + 2.0 * np.arange(300) + rng.randn(300)
    out = white_test(_daily_df(spark, ys)).collect()[0]
    r2, lm = _white_ref(ys)
    assert out.lm_stat == pytest.approx(lm, abs=1e-4)
    assert out.lm_stat < 9.21


def test_reset_equals_canonical_fitted_powers_form(spark):
    # the operator runs in the polynomial basis; the F statistic must
    # equal the textbook yhat^2/yhat^3 form exactly (same span)
    rng = np.random.RandomState(21)
    n = 150
    t = np.arange(n, dtype=float)
    ys = 40.0 + 1.5 * t + 0.02 * (t - 70.0) ** 2 + rng.randn(n)
    out = ramsey_reset(_daily_df(spark, ys)).collect()[0]
    f_ref = _reset_ref_canonical(ys)
    assert out.n_days == n
    assert out.f_stat == pytest.approx(f_ref, rel=1e-6)


def test_reset_linear_passes_quadratic_fails(spark):
    rng = np.random.RandomState(2)
    n = 250
    t = np.arange(n, dtype=float)
    lin = 10.0 + 0.7 * t + rng.randn(n)
    quad = 10.0 + 0.7 * t + 0.05 * (t - 120.0) ** 2 + rng.randn(n)
    f_lin = ramsey_reset(_daily_df(spark, lin)).collect()[0].f_stat
    f_quad = ramsey_reset(_daily_df(spark, quad)).collect()[0].f_stat
    assert f_lin < 4.7  # F(2, 246) @ 1%
    assert f_quad > 100.0
    assert f_quad == pytest.approx(
        _reset_ref_canonical(quad), rel=1e-6
    )
