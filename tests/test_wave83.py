"""Wave-83 hand pins: OLS influence diagnostics — Cook's distance /
leverage / studentized residuals, the PRESS leave-one-out identity,
closed-form VIF, and the 2-feature ridge path. Expected values are
recomputed independently in-test: Cook's D from the textbook hat-matrix
formulas on a tiny fixture, PRESS by literally refitting n held-out
regressions, VIF by solving the auxiliary regressions with numpy
lstsq, ridge by solving (X'X + λI)β = X'y with numpy.

Covered spec names: cooks_distance_influence, press_loocv_r2,
vif_multicollinearity, ridge_price_model.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators import regression as reg


def _pts_df(spark, xs, ys):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(zip(xs, ys))],
        "rid long, x double, y double",
    )


# fixture: a clean line y = 2x + 1 plus one gross outlier at high x —
# the outlier must dominate both leverage and Cook's D
_XS = [1.0, 2.0, 3.0, 4.0, 5.0, 10.0]
_YS = [3.0, 5.1, 6.9, 9.0, 11.1, 40.0]


def _ols(xs, ys):
    x, y = np.asarray(xs), np.asarray(ys)
    n = len(x)
    xc = x - x.mean()
    b = (xc * (y - y.mean())).sum() / (xc * xc).sum()
    a = y.mean() - b * x.mean()
    e = y - a - b * x
    sxx = (xc * xc).sum()
    h = 1.0 / n + xc * xc / sxx
    s2 = (e * e).sum() / (n - 2)
    r = e / np.sqrt(s2 * (1.0 - h))
    cooks = r * r * h / (2.0 * (1.0 - h))
    return b, a, e, h, r, cooks


def test_cooks_influence_matches_textbook_formulas(spark):
    df = _pts_df(spark, _XS, _YS)
    out = reg.cooks_influence(df, "x", "y", ["rid"], top_n=6)
    rows = {r.rid: r for r in out.collect()}
    _, _, _, h, rstud, cooks = _ols(_XS, _YS)
    for i in range(6):
        assert rows[i].leverage == pytest.approx(h[i], abs=1e-6)
        assert rows[i].r_student == pytest.approx(rstud[i], abs=1e-6)
        assert rows[i].cooks_d == pytest.approx(cooks[i], abs=1e-6)
    # the planted outlier (index 5, x=10) must rank first
    first = out.limit(1).collect()[0]
    assert first.rid == 5
    assert first.cooks_d == max(r.cooks_d for r in rows.values())


def test_press_equals_brute_force_loo_refits(spark):
    df = _pts_df(spark, _XS, _YS)
    out = reg.press_loocv(df, "x", "y").collect()[0]
    # brute force: refit n times with point i held out, predict it
    press = 0.0
    for i in range(len(_XS)):
        xs = [v for j, v in enumerate(_XS) if j != i]
        ys = [v for j, v in enumerate(_YS) if j != i]
        b, a, *_ = _ols(xs, ys)
        pred = a + b * _XS[i]
        press += (_YS[i] - pred) ** 2
    assert out.n == 6
    assert out.press_rmse == pytest.approx(
        round((press / 6) ** 0.5, 6), abs=1e-9
    )
    y = np.asarray(_YS)
    syy = ((y - y.mean()) ** 2).sum()
    assert out.predicted_r2 == pytest.approx(1.0 - press / syy, abs=1e-6)
    b, a, e, *_ = _ols(_XS, _YS)
    assert out.r2 == pytest.approx(1.0 - (e * e).sum() / syy, abs=1e-6)


def test_vif_matches_numpy_auxiliary_regressions(spark):
    rng = np.random.RandomState(7)
    v1 = rng.rand(200)
    v2 = rng.rand(200)
    v3 = 0.8 * v1 + 0.3 * v2 + 0.05 * rng.rand(200)  # collinear by design
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(v1, v2, v3)],
        "a double, b double, c double",
    )
    out = {r.variable: r for r in reg.vif_three(df, ["a", "b", "c"]).collect()}
    cols = {"a": v1, "b": v2, "c": v3}
    for target in cols:
        others = [cols[k] for k in cols if k != target]
        X = np.column_stack([np.ones(200)] + others)
        yv = cols[target]
        beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
        resid = yv - X @ beta
        r2 = 1.0 - (resid**2).sum() / ((yv - yv.mean()) ** 2).sum()
        assert out[target].r_squared_others == pytest.approx(r2, abs=1e-6)
        assert out[target].vif == pytest.approx(1.0 / (1.0 - r2), abs=1e-4)
    # the engineered near-collinear column must scream loudest
    assert out["c"].vif > out["a"].vif and out["c"].vif > out["b"].vif
    assert out["c"].vif > 10.0


def test_ridge_lambda_zero_is_ols_and_path_shrinks(spark):
    rng = np.random.RandomState(11)
    x1 = rng.rand(300) * 10
    x2 = rng.rand(300)
    yv = 3.0 * x1 - 7.0 * x2 + 2.0 + 0.1 * rng.rand(300)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, yv)],
        "x1 double, x2 double, y double",
    )
    lambdas = (0.0, 50.0, 5000.0)
    rows = {
        r["lambda"]: r
        for r in reg.ridge_two_feature(
            df, "x1", "x2", "y", lambdas=lambdas
        ).collect()
    }
    X1c, X2c = x1 - x1.mean(), x2 - x2.mean()
    XtX = np.array(
        [[(X1c * X1c).sum(), (X1c * X2c).sum()],
         [(X1c * X2c).sum(), (X2c * X2c).sum()]]
    )
    Xty = np.array([(X1c * (yv - yv.mean())).sum(),
                    (X2c * (yv - yv.mean())).sum()])
    for lam in lambdas:
        beta = np.linalg.solve(XtX + lam * np.eye(2), Xty)
        b0 = yv.mean() - beta[0] * x1.mean() - beta[1] * x2.mean()
        assert rows[lam].beta_x1 == pytest.approx(beta[0], abs=1e-6)
        assert rows[lam].beta_x2 == pytest.approx(beta[1], abs=1e-6)
        assert rows[lam].intercept == pytest.approx(b0, abs=1e-6)
    # λ=0 is OLS to machine precision, and the coef norm shrinks
    # monotonically along the path
    norms = [rows[lam].coef_norm for lam in lambdas]
    assert norms[0] > norms[1] > norms[2] > 0.0
    assert rows[0.0].beta_x1 == pytest.approx(3.0, abs=0.05)
    assert rows[0.0].beta_x2 == pytest.approx(-7.0, abs=0.2)


def test_cooks_top_n_and_tiebreak_determinism(spark):
    # duplicate points produce exactly tied Cook's D; the key tiebreak
    # must make top-k stable
    xs = [1.0, 1.0, 2.0, 3.0, 9.0]
    ys = [2.0, 2.0, 4.1, 5.9, 30.0]
    df = _pts_df(spark, xs, ys)
    out1 = [r.rid for r in reg.cooks_influence(df, "x", "y", ["rid"], top_n=3).collect()]
    out2 = [r.rid for r in reg.cooks_influence(df, "x", "y", ["rid"], top_n=3).collect()]
    assert out1 == out2
    assert out1[0] == 4  # the planted outlier leads
    assert len(out1) == 3
