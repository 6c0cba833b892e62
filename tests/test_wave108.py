"""Wave-108 hand pins: DFA alpha and Higuchi fractal dimension. Both
against plain-Python definition references, plus the theory poles:
white noise scores alpha ~ 0.5 / D ~ 2, a random walk alpha ~ 1.5,
and a smooth curve D ~ 1.

Covered spec names: dfa_alpha_daily, higuchi_fd_daily.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    dfa_alpha,
    higuchi_fd,
)

_SIZES = (8, 16, 32, 64)
_KS = (1, 2, 3, 4, 6, 8)


def _daily_df(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "day int, y double"
    )


def _dfa_ref(ys, sizes=_SIZES):
    y0 = np.asarray(ys, dtype=float)
    n = len(y0)
    y = y0 * n / y0.sum() - 1.0
    p = np.cumsum(y)
    t = np.arange(1, n + 1, dtype=float)
    fs = []
    for s in sizes:
        nb = n // s
        total = 0.0
        for b in range(nb):
            xs = t[b * s : (b + 1) * s]
            ps = p[b * s : (b + 1) * s]
            X = np.column_stack([np.ones(s), xs])
            beta, *_ = np.linalg.lstsq(X, ps, rcond=None)
            total += ((ps - X @ beta) ** 2).sum()
        fs.append(math.sqrt(total / (nb * s)))
    lx = np.log(np.asarray(sizes, dtype=float))
    ly = np.log(np.asarray(fs))
    alpha = ((lx - lx.mean()) * (ly - ly.mean())).sum() / (
        (lx - lx.mean()) ** 2
    ).sum()
    return fs, alpha


def _higuchi_ref(ys, ks=_KS):
    y0 = np.asarray(ys, dtype=float)
    n = len(y0)
    y = y0 * n / y0.sum()
    lks = []
    for k in ks:
        lms = []
        for m in range(1, k + 1):
            idx = np.arange(m - 1, n, k)
            if len(idx) < 2:
                continue
            steps = np.abs(np.diff(y[idx]))
            lms.append(
                steps.sum() * (n - 1) / (len(steps) * k * k)
            )
        lks.append(sum(lms) / len(lms))
    lx = np.log(np.asarray(ks, dtype=float))
    ly = np.log(np.asarray(lks))
    d = -((lx - lx.mean()) * (ly - ly.mean())).sum() / (
        (lx - lx.mean()) ** 2
    ).sum()
    return d


def test_dfa_matches_reference_white_noise(spark):
    rng = np.random.RandomState(13)
    ys = 100.0 + rng.randn(600)
    out = dfa_alpha(_daily_df(spark, ys)).collect()[0]
    fs, alpha = _dfa_ref(ys)
    assert out.n_days == 600
    for s, f_ref in zip(_SIZES, fs):
        assert getattr(out, f"f{s}") == pytest.approx(f_ref, abs=1e-5)
    assert out.dfa_alpha == pytest.approx(alpha, abs=1e-5)
    assert 0.3 < out.dfa_alpha < 0.7  # white noise ~ 0.5


def test_dfa_random_walk_is_three_halves(spark):
    rng = np.random.RandomState(7)
    ys = 1000.0 + np.cumsum(rng.randn(800))
    out = dfa_alpha(_daily_df(spark, ys)).collect()[0]
    _, alpha = _dfa_ref(ys)
    assert out.dfa_alpha == pytest.approx(alpha, abs=1e-5)
    assert out.dfa_alpha > 1.2  # integrated noise ~ 1.5


def test_higuchi_matches_reference_noise(spark):
    rng = np.random.RandomState(3)
    ys = 50.0 + rng.rand(500)
    out = higuchi_fd(_daily_df(spark, ys)).collect()[0]
    d_ref = _higuchi_ref(ys)
    assert out.higuchi_d == pytest.approx(d_ref, abs=1e-5)
    assert out.higuchi_d > 1.85  # noise graph ~ 2


def test_higuchi_smooth_curve_is_one(spark):
    ys = [100.0 + 0.5 * i for i in range(400)]
    out = higuchi_fd(_daily_df(spark, ys)).collect()[0]
    assert out.higuchi_d == pytest.approx(1.0, abs=0.02)
    assert out.r2_fit > 0.999


def test_complementarity_on_shared_noise(spark):
    # for fractional noise D ~ 2 - alpha; check the pair roughly
    # agrees on plain white noise (alpha ~ .5, D ~ 2 -> sum ~ 2.5;
    # allow generous slack, the relation is asymptotic)
    rng = np.random.RandomState(29)
    ys = 10.0 + rng.randn(700)
    a = dfa_alpha(_daily_df(spark, ys)).collect()[0].dfa_alpha
    d = higuchi_fd(_daily_df(spark, ys)).collect()[0].higuchi_d
    assert abs((2.0 - a) - d) < 0.6
