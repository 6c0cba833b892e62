"""Wave-117 hand pins: Lin's CCC and Bland-Altman limits. CCC against
a numpy reference with the defining poles — identity agreement
scores 1, while a perfectly correlated but scale-biased pipeline
(y = 2x + 5, Pearson r = 1) scores far below 1 with C_b carrying all
the loss; Bland-Altman against direct recomputation, the ~5%
exceedance property under normal differences, and planted-bias
detection.

Covered spec names: ccc_revenue_pipelines, bland_altman_revenue.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.reconcile import (
    bland_altman,
    concordance_ccc,
)

_Z = 1.959963984540054


def _df(spark, xs, ys):
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)],
        "x double, y double",
    )


def _ccc_ref(xs, ys):
    x = np.asarray(xs, dtype=float)
    y = np.asarray(ys, dtype=float)
    vx, vy = x.var(), y.var()
    cov = ((x - x.mean()) * (y - y.mean())).mean()
    r = cov / math.sqrt(vx * vy)
    ccc = 2 * cov / (vx + vy + (x.mean() - y.mean()) ** 2)
    return r, ccc


def test_ccc_matches_reference(spark):
    rng = np.random.RandomState(11)
    xs = 100 + 10 * rng.randn(300)
    ys = xs + 3.0 + 4.0 * rng.randn(300)
    out = concordance_ccc(_df(spark, xs, ys), "x", "y").collect()[0]
    r, ccc = _ccc_ref(xs, ys)
    assert out.n == 300
    assert out.pearson_r == pytest.approx(r, abs=1e-6)
    assert out.ccc == pytest.approx(ccc, abs=1e-6)
    assert out.c_b == pytest.approx(ccc / r, abs=1e-5)


def test_ccc_identity_is_one_scale_bias_is_not(spark):
    rng = np.random.RandomState(5)
    xs = 50 + 5 * rng.randn(200)
    same = concordance_ccc(_df(spark, xs, xs), "x", "y").collect()[0]
    assert same.ccc == pytest.approx(1.0, abs=1e-9)
    assert same.pearson_r == pytest.approx(1.0, abs=1e-9)
    # y = 2x + 5: Pearson cannot see the disagreement, CCC must
    biased = concordance_ccc(
        _df(spark, xs, 2 * xs + 5), "x", "y"
    ).collect()[0]
    assert biased.pearson_r == pytest.approx(1.0, abs=1e-9)
    r, ccc = _ccc_ref(xs, 2 * xs + 5)
    assert biased.ccc == pytest.approx(ccc, abs=1e-6)
    assert biased.ccc < 0.5
    assert biased.c_b == pytest.approx(ccc, abs=1e-5)  # c_b = ccc/r = ccc


def _ba_ref(xs, ys):
    d = np.asarray(xs, dtype=float) - np.asarray(ys, dtype=float)
    bias = d.mean()
    sd = d.std(ddof=1)
    lo, hi = bias - _Z * sd, bias + _Z * sd
    frac = ((d < lo) | (d > hi)).mean()
    return bias, lo, hi, frac


def test_bland_altman_matches_reference(spark):
    rng = np.random.RandomState(17)
    xs = 100 + 10 * rng.randn(500)
    ys = xs - 2.5 + 3.0 * rng.randn(500)
    out = bland_altman(_df(spark, xs, ys), "x", "y").collect()[0]
    bias, lo, hi, frac = _ba_ref(xs, ys)
    assert out.n == 500
    assert out.bias == pytest.approx(bias, abs=1e-6)
    assert out.loa_lo == pytest.approx(lo, abs=1e-6)
    assert out.loa_hi == pytest.approx(hi, abs=1e-6)
    assert out.frac_outside == pytest.approx(frac, abs=1e-9)
    # planted +2.5 systematic bias is recovered
    assert out.bias == pytest.approx(2.5, abs=0.5)
    # normal differences: ~5% outside the limits
    assert 0.01 <= out.frac_outside <= 0.10


def test_bland_altman_identical_pipelines(spark):
    xs = [float(10 + i) for i in range(50)]
    out = bland_altman(_df(spark, xs, xs), "x", "y").collect()[0]
    assert out.bias == pytest.approx(0.0, abs=1e-12)
    assert out.loa_lo == pytest.approx(0.0, abs=1e-12)
    assert out.loa_hi == pytest.approx(0.0, abs=1e-12)
    assert out.frac_outside == pytest.approx(0.0, abs=1e-12)
