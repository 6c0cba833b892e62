"""Wave-87 hand pins: the IPW / doubly-robust AIPW scoring pass.
Expected values recomputed independently in-test with numpy over a
small fixture: Hajek weighting, the AIPW identity, Kish effective
sample size, trim clipping, and the doubly-robust property (AIPW
recovers the truth when the outcome model is right even under a wrong
propensity, and vice versa).

Covered spec names: ipw_ate_order_priority.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.causal import ipw_ate_scored


def _df(spark, t, y, logit, m1, m0):
    rows = [
        (int(a), float(b), float(c), float(d), float(e))
        for a, b, c, d, e in zip(t, y, logit, m1, m0)
    ]
    return spark.createDataFrame(
        rows, "t int, y double, lg double, m1 double, m0 double"
    )


def _run(spark, t, y, logit, m1, m0, trims=(0.01, 0.05, 0.10)):
    out = ipw_ate_scored(
        _df(spark, t, y, logit, m1, m0),
        "t",
        "y",
        F.col("lg"),
        F.col("m1"),
        F.col("m0"),
        trims=trims,
    ).collect()
    return {r.trim: r for r in out}


def _ref(t, y, logit, m1, m0, trim):
    t = np.asarray(t, dtype=float)
    y = np.asarray(y, dtype=float)
    p = 1.0 / (1.0 + np.exp(-np.asarray(logit)))
    p = np.clip(p, trim, 1.0 - trim)
    m1 = np.asarray(m1)
    m0 = np.asarray(m0)
    w_t, w_c = t / p, (1 - t) / (1 - p)
    ipw = (w_t * y).sum() / w_t.sum() - (w_c * y).sum() / w_c.sum()
    aipw = np.mean(
        m1 - m0 + t * (y - m1) / p - (1 - t) * (y - m0) / (1 - p)
    )
    naive = y[t == 1].mean() - y[t == 0].mean()
    ess_t = w_t.sum() ** 2 / (w_t**2).sum()
    ess_c = w_c.sum() ** 2 / (w_c**2).sum()
    return naive, ipw, aipw, ess_t, ess_c


def test_ipw_matches_numpy_reference_per_trim(spark):
    rng = np.random.RandomState(5)
    n = 120
    x = rng.rand(n)
    logit = 2.0 * x - 1.0
    p_true = 1.0 / (1.0 + np.exp(-logit))
    t = (rng.rand(n) < p_true).astype(int)
    y = 10.0 + 5.0 * x + 3.0 * t + 0.1 * rng.rand(n)
    m1 = 10.0 + 5.0 * x + 3.0
    m0 = 10.0 + 5.0 * x
    got = _run(spark, t, y, logit, m1, m0)
    for trim in (0.01, 0.05, 0.10):
        naive, ipw, aipw, ess_t, ess_c = _ref(t, y, logit, m1, m0, trim)
        r = got[trim]
        assert r.ate_naive == pytest.approx(naive, abs=1e-6)
        assert r.ate_ipw == pytest.approx(ipw, abs=1e-6)
        assert r.ate_aipw == pytest.approx(aipw, abs=1e-6)
        assert r.ess_treat == pytest.approx(ess_t, abs=1e-4)
        assert r.ess_control == pytest.approx(ess_c, abs=1e-4)
        assert r.n_treat == int(t.sum())
        assert r.n_control == n - int(t.sum())


def test_aipw_doubly_robust_under_wrong_propensity(spark):
    # confounded assignment, CORRECT outcome model, garbage propensity:
    # AIPW must still land near the true effect 3.0 while IPW biases
    rng = np.random.RandomState(9)
    n = 4000
    x = rng.rand(n)
    t = (rng.rand(n) < np.clip(0.2 + 0.6 * x, 0.05, 0.95)).astype(int)
    y = 10.0 + 50.0 * x + 3.0 * t  # no noise: outcome model exact
    m1 = 10.0 + 50.0 * x + 3.0
    m0 = 10.0 + 50.0 * x
    wrong_logit = np.zeros(n)  # claims p=0.5 everywhere
    got = _run(spark, t, y, wrong_logit, m1, m0, trims=(0.01,))
    r = got[0.01]
    # with a correct outcome model the AIPW residual terms cancel
    assert r.ate_aipw == pytest.approx(3.0, abs=1e-6)
    # naive comparison inherits the confounding (x -> both t and y)
    assert abs(r.ate_naive - 3.0) > 1.0


def test_ipw_unbiased_under_correct_propensity_wrong_outcome(spark):
    # deterministic balanced design: p = 0.5 exactly, outcome model
    # garbage -> Hajek IPW equals the exact difference of means; AIPW's
    # residual correction also recovers it
    t = [1, 0] * 50
    x = list(range(100))
    y = [20.0 + 0.1 * xi + 4.0 * ti for xi, ti in zip(x, t)]
    logit = [0.0] * 100
    m1 = [999.0] * 100  # deliberately wrong
    m0 = [-999.0] * 100
    got = _run(spark, t, y, logit, m1, m0, trims=(0.05,))
    r = got[0.05]
    naive, ipw, aipw, *_ = _ref(t, y, logit, m1, m0, 0.05)
    assert r.ate_ipw == pytest.approx(ipw, abs=1e-6)
    assert r.ate_aipw == pytest.approx(aipw, abs=1e-6)
    # p=0.5 for everyone -> IPW == naive difference of means
    assert r.ate_ipw == pytest.approx(r.ate_naive, abs=1e-9)


def test_trim_clips_extreme_weights(spark):
    # one unit with an extreme logit: heavier trimming must shrink its
    # weight and raise the effective sample size
    t = [1, 1, 1, 0, 0, 0]
    y = [5.0, 6.0, 7.0, 1.0, 2.0, 3.0]
    logit = [-8.0, 0.0, 0.0, 0.0, 0.0, 0.0]  # unit 0: p ~ 0.0003
    m1 = [0.0] * 6
    m0 = [0.0] * 6
    got = _run(spark, t, y, logit, m1, m0, trims=(0.01, 0.10))
    assert got[0.10].ess_treat > got[0.01].ess_treat
    for trim in (0.01, 0.10):
        naive, ipw, aipw, ess_t, ess_c = _ref(t, y, logit, m1, m0, trim)
        assert got[trim].ate_ipw == pytest.approx(ipw, abs=1e-6)
        assert got[trim].ess_treat == pytest.approx(ess_t, abs=1e-4)
