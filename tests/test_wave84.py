"""Wave-84 hand pins: the engine-portable normal kernels (Zelen-Severo
Φ, Acklam Φ⁻¹) and the experimentation batteries on top of them.
Expected values recomputed independently in-test: Φ against math.erf,
Φ⁻¹ against a bisection of math.erf, the Bayesian A/B posterior
against the Beta-moment formulas evaluated in plain Python, power
analysis against the hand-evaluated two-proportion identity, and the
Gaussian rank correlation against a numpy recompute using the
erf-bisection inverse (NOT Acklam — independent algorithm).

Covered spec names: bayes_ab_conversion, ab_power_analysis,
gaussian_rank_corr_daily.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators import probability as prob


def _phi_exact(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _inv_phi_exact(p: float) -> float:
    lo, hi = -10.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if _phi_exact(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def test_phi_matches_erf_within_stated_error(spark):
    xs = [-4.0, -2.5, -1.0, -0.5, -1e-12, 0.0, 0.3, 1.0, 1.96, 3.0, 5.0]
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = {
        r.x: r.p
        for r in df.select("x", prob.phi(F.col("x")).alias("p")).collect()
    }
    for x in xs:
        assert got[x] == pytest.approx(_phi_exact(x), abs=7.5e-8)
    # symmetry of the implementation itself
    assert got[-1.0] == pytest.approx(1.0 - got[1.0], abs=1e-12)


def test_inv_phi_matches_erf_bisection_all_regions(spark):
    ps = [0.001, 0.02, 0.024, 0.025, 0.2, 0.5, 0.8, 0.975, 0.976, 0.999]
    df = spark.createDataFrame([(float(p),) for p in ps], "p double")
    got = {
        r.p: r.z
        for r in df.select(
            "p", prob.inv_phi(F.col("p")).alias("z")
        ).collect()
    }
    for p in ps:
        assert got[p] == pytest.approx(_inv_phi_exact(p), abs=1e-7)
    assert got[0.5] == pytest.approx(0.0, abs=1e-12)
    # round-trip through the portable Φ
    df2 = spark.createDataFrame([(p,) for p in ps], "p double")
    rt = df2.select(
        "p", prob.phi(prob.inv_phi(F.col("p"))).alias("q")
    ).collect()
    for r in rt:
        assert r.q == pytest.approx(r.p, abs=2e-7)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, value double"
    )


def test_bayes_ab_posterior_matches_hand_formulas(spark):
    # arm A (even ids): users 0,2,4 -> 0&2 convert; arm B (odd): 1,3 -> 1
    rows = [
        (0, "purchase", 250.0),
        (2, "purchase", 300.0),
        (4, "purchase", 10.0),  # below the 200 cut: NOT a conversion
        (4, "click", 999.0),  # wrong type: NOT a conversion
        (1, "purchase", 201.0),
        (3, "view", 250.0),
    ]
    out = prob.bayes_ab_conversion(_events_df(spark, rows)).collect()[0]
    assert (out.users_a, out.conv_a) == (3, 2)
    assert (out.users_b, out.conv_b) == (2, 1)

    def post(s, n):
        a, b = 1.0 + s, 1.0 + (n - s)
        mu = a / (a + b)
        var = a * b / ((a + b) ** 2 * (a + b + 1.0))
        return mu, var

    mu_a, var_a = post(2, 3)
    mu_b, var_b = post(1, 2)
    assert out.posterior_rate_a == pytest.approx(mu_a, abs=1e-6)
    assert out.posterior_rate_b == pytest.approx(mu_b, abs=1e-6)
    z = (mu_b - mu_a) / math.sqrt(var_a + var_b)
    assert out.prob_b_beats_a == pytest.approx(_phi_exact(z), abs=1e-6)


def test_power_analysis_matches_hand_identity(spark):
    # 4 users, 1 converter at the >=200 cut -> baseline 0.25
    rows = [
        (0, "purchase", 250.0),
        (1, "purchase", 100.0),
        (2, "view", 400.0),
        (3, "click", 10.0),
    ]
    out = {
        r.mde: r
        for r in prob.ab_power_analysis(
            _events_df(spark, rows), mdes=(0.05, 0.10)
        ).collect()
    }
    p1 = 0.25
    for mde in (0.05, 0.10):
        p2 = p1 + mde
        pbar = (p1 + p2) / 2.0
        n = (
            prob.Z_975 * math.sqrt(2.0 * pbar * (1.0 - pbar))
            + prob.Z_80 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
        ) ** 2 / mde**2
        assert out[mde].baseline_rate == pytest.approx(p1, abs=1e-9)
        assert out[mde].required_n_per_arm == math.ceil(n)
    # a smaller effect needs more users
    assert (
        out[0.05].required_n_per_arm > out[0.10].required_n_per_arm > 0
    )


def test_gaussian_rank_corr_matches_numpy_normal_scores(spark):
    rng = np.random.RandomState(3)
    x = rng.rand(40)
    y = x**3 + 0.05 * rng.rand(40)  # monotone-transformed relation
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    out = prob.gaussian_rank_correlation(df, "x", "y").collect()[0]
    assert out.n == 40
    # independent recompute: ranks -> erf-bisection inverse -> Pearson
    rx = np.argsort(np.argsort(x)) + 1.0
    ry = np.argsort(np.argsort(y)) + 1.0
    zx = np.array([_inv_phi_exact(r / 41.0) for r in rx])
    zy = np.array([_inv_phi_exact(r / 41.0) for r in ry])
    expected = np.corrcoef(zx, zy)[0, 1]
    assert out.gauss_rank_corr == pytest.approx(expected, abs=1e-5)
    # rank-based: invariant under monotone transform of a marginal
    df2 = spark.createDataFrame(
        [(float(a), float(math.exp(b))) for a, b in zip(x, y)],
        "x double, y double",
    )
    out2 = prob.gaussian_rank_correlation(df2, "x", "y").collect()[0]
    assert out2.gauss_rank_corr == pytest.approx(
        out.gauss_rank_corr, abs=1e-9
    )
