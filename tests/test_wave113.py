"""Wave-113 hand pins: Shapiro-Francia W' and Grubbs' outlier test.
W' against a plain-Python Blom-score reference (sharing the Acklam
inverse CDF), with the normal-sample near-1 pole and the
heavy-tail/uniform deficits ordered correctly; Grubbs against direct
recomputation with a planted spike, value recovery, and the
no-outlier baseline.

Covered spec names: shapiro_francia_daily, grubbs_daily_outlier.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.probability import (
    grubbs_test,
    shapiro_francia,
)
from tests.test_wave106 import _inv_phi


def _df(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "day int, y double"
    )


def _sf_ref(ys):
    x = np.sort(np.asarray(ys, dtype=float))
    n = len(x)
    m = np.array(
        [_inv_phi((i - 0.375) / (n + 0.25)) for i in range(1, n + 1)]
    )
    c = ((x - x.mean()) * (m - m.mean())).sum()
    return c * c / (
        ((x - x.mean()) ** 2).sum() * ((m - m.mean()) ** 2).sum()
    )


def test_sf_matches_reference_and_normal_near_one(spark):
    rng = np.random.RandomState(13)
    ys = 50 + 4 * rng.randn(400)
    out = shapiro_francia(_df(spark, ys), "y").collect()[0]
    assert out.n == 400
    assert out.w_prime == pytest.approx(_sf_ref(ys), abs=1e-6)
    assert out.w_prime > 0.99


def test_sf_orders_departures(spark):
    rng = np.random.RandomState(7)
    normal = 10 + rng.randn(300)
    heavy = 10 + rng.standard_cauchy(300)
    unif = rng.rand(300)
    w_n = shapiro_francia(_df(spark, normal), "y").collect()[0].w_prime
    w_h = shapiro_francia(_df(spark, heavy), "y").collect()[0].w_prime
    w_u = shapiro_francia(_df(spark, unif), "y").collect()[0].w_prime
    assert w_n == pytest.approx(_sf_ref(normal), abs=1e-6)
    assert w_h == pytest.approx(_sf_ref(heavy), abs=1e-6)
    assert w_u == pytest.approx(_sf_ref(unif), abs=1e-6)
    # cauchy tails wreck Q-Q straightness far worse than uniform's
    # clipped tails; both sit below the normal sample
    assert w_h < w_u < w_n


def _grubbs_ref(ys):
    x = np.asarray(ys, dtype=float)
    s = x.std(ddof=1)
    g = np.abs(x - x.mean()) / s
    k = int(np.argmax(g))
    return k, x[k], g[k]


def test_grubbs_finds_planted_spike(spark):
    rng = np.random.RandomState(3)
    ys = (20 + rng.randn(200)).tolist()
    ys[77] = 45.0
    out = grubbs_test(_df(spark, ys), "day", "y").collect()[0]
    k, v, g = _grubbs_ref(ys)
    assert out.n == 200
    assert out.flagged_key == 77 == k
    assert out.flagged_value == pytest.approx(45.0, abs=1e-9)
    assert out.g_stat == pytest.approx(g, abs=1e-6)
    assert out.g_stat > 4.0


def test_grubbs_clean_sample_small_g(spark):
    rng = np.random.RandomState(21)
    ys = (5 + rng.rand(150)).tolist()
    out = grubbs_test(_df(spark, ys), "day", "y").collect()[0]
    k, v, g = _grubbs_ref(ys)
    assert out.flagged_key == k
    assert out.g_stat == pytest.approx(g, abs=1e-6)
    # uniform max normed residual is bounded well under spike levels
    assert out.g_stat < 2.5
