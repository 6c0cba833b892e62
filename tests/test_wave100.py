"""Wave-100 hand pins: sample entropy and order-3 permutation
entropy. SampEn against a plain-Python template-matching reference
(exact A/B counts) plus the regular-beats-noise ordering; PE against
a definition reference, the deterministic-monotone zero pole, the
near-1 white-noise pole, and the monotone-transform invariance that
distinguishes it from amplitude-based measures.

Covered spec names: sample_entropy_daily, permutation_entropy_daily.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    permutation_entropy,
    sample_entropy,
)


def _daily_df(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "day int, y double"
    )


def _sampen_ref(ys, r_frac=0.2):
    y = np.asarray(ys, dtype=float)
    n = len(y)
    r = r_frac * math.sqrt((y * y).mean() - y.mean() ** 2)
    tmpl = [(y[i], y[i + 1], y[i + 2]) for i in range(n - 2)]
    b = a = 0
    for i in range(len(tmpl)):
        for j in range(i + 1, len(tmpl)):
            if (
                abs(tmpl[i][0] - tmpl[j][0]) <= r
                and abs(tmpl[i][1] - tmpl[j][1]) <= r
            ):
                b += 1
                if abs(tmpl[i][2] - tmpl[j][2]) <= r:
                    a += 1
    return r, b, a, (-math.log(a / b) if a and b else None)


def _pe_ref(ys):
    from collections import Counter

    pats = Counter()
    for v0, v1, v2 in zip(ys, ys[1:], ys[2:]):
        pats[(v0 <= v1, v0 <= v2, v1 <= v2)] += 1
    n = sum(pats.values())
    h = -sum((c / n) * math.log(c / n) for c in pats.values())
    return n, len(pats), h / math.log(6.0)


def test_sampen_matches_reference(spark):
    rng = np.random.RandomState(13)
    ys = (np.sin(np.arange(80) / 3.0) * 5.0 + rng.rand(80)).tolist()
    out = sample_entropy(_daily_df(spark, ys)).collect()[0]
    r, b, a, se = _sampen_ref(ys)
    assert out.n_days == 80
    assert out.r_tol == pytest.approx(r, abs=1e-6)
    assert out.b_count == b
    assert out.a_count == a
    assert out.sampen == pytest.approx(se, abs=1e-6)


def test_sampen_regular_below_noise(spark):
    rng = np.random.RandomState(4)
    periodic = (np.sin(np.arange(120) * 2 * np.pi / 12) * 10).tolist()
    noise = (rng.rand(120) * 20 - 10).tolist()
    se_p = sample_entropy(_daily_df(spark, periodic)).collect()[0].sampen
    se_n = sample_entropy(_daily_df(spark, noise)).collect()[0].sampen
    assert se_p is not None and se_n is not None
    assert se_p < se_n


def test_sampen_no_matches_is_null(spark):
    # two antiphase templates farther apart than r in every
    # coordinate -> B = 0 -> NULL, not a crash
    ys = [0.0, 100.0, 0.0, 100.0]
    out = sample_entropy(_daily_df(spark, ys)).collect()[0]
    assert out.b_count == 0
    assert out.sampen is None


def test_pe_matches_reference_and_noise_pole(spark):
    rng = np.random.RandomState(31)
    ys = rng.rand(500).tolist()
    out = permutation_entropy(_daily_df(spark, ys)).collect()[0]
    n, k, h = _pe_ref(ys)
    assert out.n_windows == n
    assert out.n_patterns == k
    assert out.perm_entropy == pytest.approx(h, abs=1e-6)
    assert out.perm_entropy > 0.95


def test_pe_monotone_is_zero(spark):
    ys = [float(i * i) for i in range(50)]
    out = permutation_entropy(_daily_df(spark, ys)).collect()[0]
    assert out.n_patterns == 1
    assert out.perm_entropy == pytest.approx(0.0, abs=1e-9)


def test_pe_monotone_transform_invariant(spark):
    rng = np.random.RandomState(8)
    ys = (rng.rand(200) * 4 - 2).tolist()
    h1 = permutation_entropy(_daily_df(spark, ys)).collect()[0].perm_entropy
    h2 = (
        permutation_entropy(_daily_df(spark, [math.exp(y) for y in ys]))
        .collect()[0]
        .perm_entropy
    )
    assert h1 == pytest.approx(h2, abs=1e-9)
