"""Wave-95 hand pins: Chatterjee's ξ and Székely-Rizzo distance
correlation. ξ against the closed-form monotone value 1 − 3/(n+1),
the plain-Python ties-robust reference on tied data, and the
defining property Pearson fails (a perfect parabola scores ~1 on ξ,
~0 on Pearson). dCor against a brute-force numpy double-centering
reference, the perfect-linear pole (exactly 1), and an
independence-style near-zero case.

Covered spec names: chatterjee_xi_daily, distance_corr_weekly.
"""

from __future__ import annotations

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.probability import (
    chatterjee_xi,
    distance_correlation,
)


def _xy_df(spark, pts):
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in pts], "x double, y double"
    )


def _xi_ref(pts):
    # ties-robust definition (Chatterjee 2020, eq. for general y):
    # sort by (x, y); r_i = #{y_j <= y_i}; l_i = #{y_j >= y_i};
    # xi = 1 - n * sum |r_{i+1} - r_i| / (2 * sum l_i (n - l_i))
    pts = sorted(pts)
    ys = [p[1] for p in pts]
    n = len(ys)
    r = [sum(1 for yj in ys if yj <= yi) for yi in ys]
    l = [sum(1 for yj in ys if yj >= yi) for yi in ys]
    num = sum(abs(r[i + 1] - r[i]) for i in range(n - 1))
    den = sum(li * (n - li) for li in l)
    return 1.0 - n * num / (2.0 * den)


def test_xi_monotone_closed_form(spark):
    # strictly monotone y: xi = 1 - 3/(n+1) exactly (no ties)
    pts = [(float(i), 10.0 + 2.0 * i) for i in range(29)]
    out = chatterjee_xi(_xy_df(spark, pts), "x", "y").collect()[0]
    assert out.n == 29
    assert out.xi == pytest.approx(1.0 - 3.0 / 30.0, abs=1e-6)


def test_xi_sees_the_parabola_pearson_misses(spark):
    # y = (x-20)^2 is a perfect non-monotone FUNCTION of x: Pearson
    # is ~0 by symmetry, xi must be high (functional dependence)
    pts = [(float(i), (i - 20.0) ** 2) for i in range(41)]
    df = _xy_df(spark, pts)
    out = chatterjee_xi(df, "x", "y").collect()[0]
    assert out.xi == pytest.approx(_xi_ref(pts), abs=1e-6)
    assert out.xi > 0.8
    pearson = float(df.corr("x", "y"))
    assert abs(pearson) < 0.05


def test_xi_ties_match_reference(spark):
    rng = np.random.RandomState(7)
    # integer y with heavy ties, x unique
    pts = [(float(i), float(rng.randint(0, 4))) for i in range(60)]
    out = chatterjee_xi(_xy_df(spark, pts), "x", "y").collect()[0]
    assert out.xi == pytest.approx(_xi_ref(pts), abs=1e-6)


def test_xi_independent_near_zero(spark):
    rng = np.random.RandomState(3)
    pts = [(float(i), float(rng.rand())) for i in range(200)]
    out = chatterjee_xi(_xy_df(spark, pts), "x", "y").collect()[0]
    assert abs(out.xi) < 0.2


def _dcor_ref(xs, ys):
    x = np.asarray(xs, dtype=float)
    y = np.asarray(ys, dtype=float)
    a = np.abs(x[:, None] - x[None, :])
    b = np.abs(y[:, None] - y[None, :])
    A = a - a.mean(0)[None, :] - a.mean(1)[:, None] + a.mean()
    B = b - b.mean(0)[None, :] - b.mean(1)[:, None] + b.mean()
    dcov2 = (A * B).mean()
    dvx = (A * A).mean()
    dvy = (B * B).mean()
    return np.sqrt(max(dcov2, 0.0) / np.sqrt(dvx * dvy)), dvx, dvy


def test_dcor_matches_double_centering_reference(spark):
    rng = np.random.RandomState(11)
    xs = rng.rand(50).tolist()
    ys = (np.sin(6.0 * np.asarray(xs)) + 0.1 * rng.rand(50)).tolist()
    out = distance_correlation(
        _xy_df(spark, zip(xs, ys)), "x", "y"
    ).collect()[0]
    ref, dvx, dvy = _dcor_ref(xs, ys)
    assert out.n == 50
    assert out.dcor == pytest.approx(ref, abs=1e-6)
    assert out.dvar_x == pytest.approx(dvx, abs=1e-6)
    assert out.dvar_y == pytest.approx(dvy, abs=1e-6)


def test_dcor_perfect_linear_is_one(spark):
    pts = [(float(i) / 8.0, 3.0 - 0.5 * i / 8.0) for i in range(33)]
    out = distance_correlation(_xy_df(spark, pts), "x", "y").collect()[0]
    assert out.dcor == pytest.approx(1.0, abs=1e-6)


def test_dcor_independent_near_zero(spark):
    rng = np.random.RandomState(23)
    xs = rng.rand(80)
    ys = rng.rand(80)
    out = distance_correlation(
        _xy_df(spark, zip(xs.tolist(), ys.tolist())), "x", "y"
    ).collect()[0]
    ref, _, _ = _dcor_ref(xs, ys)
    assert out.dcor == pytest.approx(ref, abs=1e-6)
    assert out.dcor < 0.3
