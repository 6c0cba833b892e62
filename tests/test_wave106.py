"""Wave-106 hand pins: Brunner-Munzel and Fligner-Killeen. BM
against a plain-Python mid-rank reference (scipy's formulation) on
tied data, the stochastic-equality zero pole, and the
unequal-variance scenario it exists for; FK against a plain-Python
normal-scores reference (sharing the repo's Acklam inverse-CDF) and
the equal-scale vs inflated-scale separation.

Covered spec names: brunner_munzel_click_purchase,
fligner_killeen_priority_price.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    brunner_munzel,
    fligner_killeen,
)


def _df(spark, xs, ys):
    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    return spark.createDataFrame(rows, "g string, v double")


def _midranks(values, pool):
    sp = sorted(pool)
    out = []
    for v in values:
        below = sum(1 for w in sp if w < v)
        ties = sum(1 for w in sp if w == v)
        out.append(below + (ties + 1) / 2.0)
    return out


def _bm_ref(xs, ys):
    n, m = len(xs), len(ys)
    pool = list(xs) + list(ys)
    rx = _midranks(xs, pool)
    ry = _midranks(ys, pool)
    rxx = _midranks(xs, xs)
    ryy = _midranks(ys, ys)
    rbar_x = sum(rx) / n
    rbar_y = sum(ry) / m
    sx2 = sum(
        (rx[i] - rxx[i] - rbar_x + (n + 1) / 2.0) ** 2 for i in range(n)
    ) / (n - 1)
    sy2 = sum(
        (ry[i] - ryy[i] - rbar_y + (m + 1) / 2.0) ** 2 for i in range(m)
    ) / (m - 1)
    w = n * m * (rbar_y - rbar_x) / ((n + m) * math.sqrt(n * sx2 + m * sy2))
    p_hat = (rbar_y - (m + 1) / 2.0) / n
    return p_hat, w


def test_bm_matches_reference_with_ties(spark):
    rng = np.random.RandomState(11)
    xs = rng.randint(0, 12, size=60).astype(float).tolist()
    ys = (rng.randint(0, 12, size=45) + 2).astype(float).tolist()
    out = brunner_munzel(_df(spark, xs, ys), "g", "v", "a", "b").collect()[0]
    p_ref, w_ref = _bm_ref(xs, ys)
    assert out.n_a == 60
    assert out.n_b == 45
    assert out.p_hat == pytest.approx(p_ref, abs=1e-6)
    assert out.bm_stat == pytest.approx(w_ref, abs=1e-6)
    assert out.bm_stat > 2.0  # shifted-up ys: stochastically larger


def test_bm_identical_groups_zero(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    out = brunner_munzel(
        _df(spark, vals, vals), "g", "v", "a", "b"
    ).collect()[0]
    assert out.p_hat == pytest.approx(0.5, abs=1e-9)
    assert out.bm_stat == pytest.approx(0.0, abs=1e-9)


def test_bm_unequal_spread_reference(spark):
    # same center, very different spreads: the exact case BM handles
    # and plain Mann-Whitney's variance model mis-prices
    rng = np.random.RandomState(5)
    xs = (50.0 + rng.randn(80)).tolist()
    ys = (50.0 + 30.0 * rng.randn(50)).tolist()
    out = brunner_munzel(_df(spark, xs, ys), "g", "v", "a", "b").collect()[0]
    p_ref, w_ref = _bm_ref(xs, ys)
    assert out.bm_stat == pytest.approx(w_ref, abs=1e-6)
    assert abs(out.bm_stat) < 2.0  # no stochastic ordering


def _inv_phi(p):
    from mcas_question2_etl_spark.operators.probability import (
        _ACK_A, _ACK_B, _ACK_C, _ACK_D, _ACK_PLOW,
    )
    a = _ACK_A
    b = _ACK_B
    c = _ACK_C
    d = _ACK_D
    if p < _ACK_PLOW:
        q = math.sqrt(-2.0 * math.log(p))
        return (
            ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
            + c[5]
        ) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
    if p > 1.0 - _ACK_PLOW:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        return -(
            ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
            + c[5]
        ) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0)
    q = p - 0.5
    r = q * q
    return (
        (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5])
        * q
        / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0)
    )


def _fk_ref(groups):
    import statistics

    all_u = []
    tags = []
    for gi, vals in enumerate(groups):
        med = statistics.median(vals)
        for v in vals:
            all_u.append(abs(v - med))
            tags.append(gi)
    n = len(all_u)
    ranks = _midranks(all_u, all_u)
    a = [_inv_phi(0.5 + r / (2.0 * (n + 1.0))) for r in ranks]
    abar = sum(a) / n
    v = sum((ai - abar) ** 2 for ai in a) / (n - 1)
    fk = 0.0
    for gi in range(len(groups)):
        ag = [a[i] for i in range(n) if tags[i] == gi]
        fk += len(ag) * (sum(ag) / len(ag) - abar) ** 2
    return fk / v


def _kdf(spark, groups):
    rows = [
        (f"g{gi}", float(v)) for gi, vals in enumerate(groups) for v in vals
    ]
    return spark.createDataFrame(rows, "g string, v double")


def test_fk_matches_reference(spark):
    rng = np.random.RandomState(23)
    groups = [
        (100 + 5 * rng.randn(40)).tolist(),
        (100 + 5 * rng.randn(35)).tolist(),
        (100 + 25 * rng.randn(30)).tolist(),
    ]
    out = fligner_killeen(_kdf(spark, groups), "g", "v").collect()[0]
    assert out.k == 3
    assert out.n == 105
    assert out.df == 2
    assert out.fk_stat == pytest.approx(_fk_ref(groups), abs=1e-5)
    assert out.fk_stat > 9.21  # chi2(2) @ 1%: the inflated group shows


def test_fk_equal_scales_small(spark):
    rng = np.random.RandomState(9)
    groups = [(50 + 4 * rng.randn(50)).tolist() for _ in range(4)]
    out = fligner_killeen(_kdf(spark, groups), "g", "v").collect()[0]
    assert out.fk_stat == pytest.approx(_fk_ref(groups), abs=1e-5)
    assert out.fk_stat < 11.34  # chi2(3) @ 1%
