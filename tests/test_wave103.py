"""Wave-103 hand pins: Hoeffding's D and Blomqvist's beta. D against
a plain-Python half-credit reference on tied data, the perfect-
monotone pole (D = 1/30, d_scaled = 1), and the independence zero;
beta against quadrant counting with the on-median exclusion, the
perfect-dependence pole, and monotone invariance.

Covered spec names: hoeffding_d_daily, blomqvist_beta_daily.
"""

from __future__ import annotations

import statistics

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.probability import (
    blomqvist_beta,
    hoeffding_d,
)


def _xy_df(spark, pts):
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "x double, y double"
    )


def _phi(a, b):
    return 1.0 if a < b else (0.5 if a == b else 0.0)


def _hoeffding_ref(pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    n = len(pts)
    R = [
        1 + sum(_phi(xs[j], xs[i]) for j in range(n) if j != i)
        for i in range(n)
    ]
    S = [
        1 + sum(_phi(ys[j], ys[i]) for j in range(n) if j != i)
        for i in range(n)
    ]
    Q = [
        sum(
            _phi(xs[j], xs[i]) * _phi(ys[j], ys[i])
            for j in range(n)
            if j != i
        )
        for i in range(n)
    ]
    d1 = sum(q * (q - 1) for q in Q)
    d2 = sum(
        (R[i] - 1) * (R[i] - 2) * (S[i] - 1) * (S[i] - 2) for i in range(n)
    )
    d3 = sum((R[i] - 2) * (S[i] - 2) * Q[i] for i in range(n))
    num = (n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return 30.0 * num / den


def test_hoeffding_matches_reference_with_ties(spark):
    rng = np.random.RandomState(19)
    pts = [
        (float(rng.randint(0, 8)), float(rng.randint(0, 5)))
        for _ in range(40)
    ]
    out = hoeffding_d(_xy_df(spark, pts), "x", "y").collect()[0]
    ref = _hoeffding_ref(pts)
    assert out.n == 40
    assert out.d_scaled == pytest.approx(ref, abs=1e-6)
    assert out.d_stat == pytest.approx(ref / 30.0, abs=1e-6)


def test_hoeffding_perfect_monotone_is_one(spark):
    pts = [(float(i), float(i * i)) for i in range(30)]
    out = hoeffding_d(_xy_df(spark, pts), "x", "y").collect()[0]
    assert out.d_scaled == pytest.approx(1.0, abs=1e-9)


def test_hoeffding_independent_near_zero(spark):
    rng = np.random.RandomState(3)
    pts = list(zip(rng.rand(200).tolist(), rng.rand(200).tolist()))
    out = hoeffding_d(_xy_df(spark, pts), "x", "y").collect()[0]
    assert out.d_scaled == pytest.approx(_hoeffding_ref(pts), abs=1e-6)
    assert abs(out.d_scaled) < 0.05


def _beta_ref(pts):
    mx = statistics.median([p[0] for p in pts])
    my = statistics.median([p[1] for p in pts])
    c = d = 0
    for x, y in pts:
        if x == mx or y == my:
            continue
        if (x > mx) == (y > my):
            c += 1
        else:
            d += 1
    return c + d, (c - d) / (c + d)


def test_beta_matches_reference_with_median_exclusions(spark):
    # odd count: the middle value sits exactly on the median and is
    # excluded; a few duplicates land on it too
    pts = [
        (1.0, 2.0), (2.0, 1.0), (3.0, 3.0), (4.0, 5.0), (5.0, 4.0),
        (3.0, 6.0), (6.0, 3.0), (7.0, 8.0), (8.0, 7.0),
    ]
    out = blomqvist_beta(_xy_df(spark, pts), "x", "y").collect()[0]
    n_used, beta = _beta_ref(pts)
    assert out.n == 9
    assert out.n_used == n_used
    assert out.beta == pytest.approx(beta, abs=1e-6)


def test_beta_perfect_positive_and_monotone_invariance(spark):
    rng = np.random.RandomState(7)
    xs = rng.rand(50).tolist()
    pts = [(x, 3.0 * x + 1.0) for x in xs]
    out = blomqvist_beta(_xy_df(spark, pts), "x", "y").collect()[0]
    assert out.beta == pytest.approx(1.0, abs=1e-9)
    # cubing y is monotone: beta unchanged
    pts2 = [(x, (3.0 * x + 1.0) ** 3) for x in xs]
    out2 = blomqvist_beta(_xy_df(spark, pts2), "x", "y").collect()[0]
    assert out2.beta == pytest.approx(out.beta, abs=1e-9)


def test_beta_independent_near_zero(spark):
    rng = np.random.RandomState(42)
    pts = list(zip(rng.rand(300).tolist(), rng.rand(300).tolist()))
    out = blomqvist_beta(_xy_df(spark, pts), "x", "y").collect()[0]
    n_used, beta = _beta_ref(pts)
    assert out.n_used == n_used
    assert out.beta == pytest.approx(beta, abs=1e-6)
    assert abs(out.beta) < 0.2
