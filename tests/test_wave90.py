"""Wave-90 hand pins: Wasserstein-1 drift (CDF-integral form) and the
generalized-Pareto tail fit. Expected values recomputed independently
in-test: W1 against scipy-free sorted-sample and CDF-integral
references in plain Python (including the equal-sample order-statistic
identity), the GPD fit against hand-evaluated method-of-moments
formulas and a recovery check on synthetic GPD draws.

Covered spec names: wasserstein_doclen_drift, gpd_tail_fit_prices.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.evaluation import wasserstein_1d
from mcas_question2_etl_spark.operators.timeseries import gpd_tail_fit


def _w1_ref(a, b):
    """CDF-integral reference on merged support, plain Python."""
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    total = 0.0
    for v, nxt in zip(support, support[1:]):
        fa = sum(1 for x in a if x <= v) / na
        fb = sum(1 for x in b if x <= v) / nb
        total += abs(fa - fb) * (nxt - v)
    return total


def _df(spark, a, b):
    rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
    return spark.createDataFrame(rows, "g string, v double")


def test_w1_matches_cdf_integral_reference(spark):
    a = [1, 2, 2, 3, 10, 10, 11]
    b = [2, 3, 3, 5, 8]
    out = wasserstein_1d(_df(spark, a, b), "g", "v", "A", "B").collect()[0]
    assert out.n_a == len(a) and out.n_b == len(b)
    assert out.n_support == len(set(a) | set(b))
    assert out.w1 == pytest.approx(_w1_ref(a, b), abs=1e-6)


def test_w1_equal_samples_order_statistic_identity(spark):
    # for equal-sized samples W1 = mean |x_(i) - y_(i)|
    rng = np.random.RandomState(8)
    a = sorted(rng.randint(0, 500, size=60).tolist())
    b = sorted(rng.randint(0, 500, size=60).tolist())
    out = wasserstein_1d(_df(spark, a, b), "g", "v", "A", "B").collect()[0]
    ident = sum(abs(x - y) for x, y in zip(a, b)) / 60.0
    assert out.w1 == pytest.approx(ident, abs=1e-6)
    assert out.w1 == pytest.approx(_w1_ref(a, b), abs=1e-6)


def test_w1_translation_and_identity_properties(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    out0 = wasserstein_1d(_df(spark, a, a), "g", "v", "A", "B").collect()[0]
    assert out0.w1 == 0.0
    shifted = [x + 7.5 for x in a]
    out7 = wasserstein_1d(
        _df(spark, a, shifted), "g", "v", "A", "B"
    ).collect()[0]
    assert out7.w1 == pytest.approx(7.5, abs=1e-6)


def _gpd_ref(values, u):
    exc = [v - u for v in values if v > u]
    n = len(exc)
    m = sum(exc) / n
    var = sum((e - m) ** 2 for e in exc) / (n - 1)
    ratio = m * m / var
    xi = (1.0 - ratio) / 2.0
    sigma = m * (ratio + 1.0) / 2.0
    tail = (sigma + xi * u) / (1.0 - xi) if xi < 1.0 else None
    return n, m, xi, sigma, tail


def test_gpd_matches_hand_formulas(spark):
    vals = [50, 120, 130, 90, 200, 175, 110, 300, 101, 99]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = gpd_tail_fit(df, "x", 100.0).collect()[0]
    n, m, xi, sigma, tail = _gpd_ref(vals, 100.0)
    assert out.n_exceedances == n
    assert out.mean_excess == pytest.approx(m, abs=1e-6)
    assert out.xi_hat == pytest.approx(xi, abs=1e-6)
    assert out.sigma_hat == pytest.approx(sigma, abs=1e-6)
    assert out.tail_expect_2u == pytest.approx(tail, abs=1e-4)


def test_gpd_recovers_synthetic_tail(spark):
    # exponential tail = GPD with xi = 0: the estimator must land near
    # xi 0 and sigma near the exponential scale
    rng = np.random.RandomState(12)
    scale = 40.0
    vals = 100.0 + rng.exponential(scale, size=20000)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = gpd_tail_fit(df, "x", 100.0).collect()[0]
    assert out.n_exceedances == 20000
    assert abs(out.xi_hat) < 0.05
    assert out.sigma_hat == pytest.approx(scale, rel=0.05)
    # heavy tail: pareto draws -> xi near the true 1/alpha
    alpha = 4.0
    vals2 = 100.0 * (1.0 + rng.pareto(alpha, size=20000))
    df2 = spark.createDataFrame([(float(v),) for v in vals2], "x double")
    out2 = gpd_tail_fit(df2, "x", 100.0).collect()[0]
    assert out2.xi_hat == pytest.approx(1.0 / alpha, abs=0.08)
