"""Wave-104 hand pins: ACE richness and Chao-Shen entropy. Both
against plain-Python definition references on constructed frequency
tables; the degenerate poles (no rare tail, all-singleton tail)
return NULL instead of dividing by zero; and the correction
directions hold (ACE >= observed richness, Chao-Shen >= plug-in when
singletons exist).

Covered spec names: ace_vocab_estimate, chao_shen_entropy_vocab.
"""

from __future__ import annotations

import math

import pytest

from mcas_question2_etl_spark.operators.sketches import (
    ace_richness,
    chao_shen_entropy,
)


def _df_from_freqs(spark, freqs):
    rows = []
    for i, c in enumerate(freqs):
        rows.extend([(f"t{i}",)] * c)
    return spark.createDataFrame(rows, "k string")


def _ace_ref(freqs, cutoff=10):
    rare = [c for c in freqs if c <= cutoff]
    s_abund = sum(1 for c in freqs if c > cutoff)
    s_rare = len(rare)
    f1 = sum(1 for c in rare if c == 1)
    n_rare = sum(rare)
    if n_rare == 0 or f1 == n_rare:
        return None
    cov = 1.0 - f1 / n_rare
    g2 = max(
        s_rare * sum(c * (c - 1) for c in rare)
        / (cov * n_rare * (n_rare - 1))
        - 1.0,
        0.0,
    )
    return s_abund + s_rare / cov + f1 * g2 / cov


def _cs_ref(freqs):
    n = sum(freqs)
    f1 = sum(1 for c in freqs if c == 1)
    cov = 1.0 - f1 / n
    h = 0.0
    for c in freqs:
        cp = cov * c / n
        h -= cp * math.log(cp) / (1.0 - math.exp(n * math.log(1.0 - cp)))
    return cov, h


_FREQS = [1, 1, 1, 2, 2, 3, 5, 7, 11, 40, 120]


def test_ace_matches_reference(spark):
    out = ace_richness(_df_from_freqs(spark, _FREQS), "k").collect()[0]
    ref = _ace_ref(_FREQS)
    assert out.s_obs == len(_FREQS)
    assert out.s_rare == 8
    assert out.s_abund == 3
    assert out.f1 == 3
    assert out.ace == pytest.approx(ref, abs=0.01)
    assert out.ace >= out.s_obs  # richness correction adds, never removes


def test_ace_no_rare_tail_is_null(spark):
    out = ace_richness(
        _df_from_freqs(spark, [20, 30, 40]), "k"
    ).collect()[0]
    assert out.ace is None
    assert out.coverage is None


def test_ace_all_singletons_is_null(spark):
    out = ace_richness(
        _df_from_freqs(spark, [1, 1, 1, 1]), "k"
    ).collect()[0]
    assert out.ace is None


def test_chao_shen_matches_reference(spark):
    out = chao_shen_entropy(
        _df_from_freqs(spark, _FREQS), "k"
    ).collect()[0]
    cov, h = _cs_ref(_FREQS)
    assert out.n_tokens == sum(_FREQS)
    assert out.s_obs == len(_FREQS)
    assert out.coverage == pytest.approx(cov, abs=1e-6)
    assert out.h_chao_shen == pytest.approx(h, abs=1e-6)
    # singletons present: the adjusted entropy must exceed plug-in
    assert out.h_chao_shen > out.h_plugin


def test_chao_shen_no_singletons_collapses_to_plugin(spark):
    freqs = [2, 3, 5, 8]
    out = chao_shen_entropy(_df_from_freqs(spark, freqs), "k").collect()[0]
    assert out.coverage == pytest.approx(1.0, abs=1e-12)
    # C = 1: detection weights are 1 - (1-p)^n < 1, so the estimator
    # still nudges up, but with cp = p the plug-in term is recovered
    # in the numerator; check against the reference exactly
    _, h = _cs_ref(freqs)
    assert out.h_chao_shen == pytest.approx(h, abs=1e-6)


def test_chao_shen_all_singletons_is_null(spark):
    out = chao_shen_entropy(
        _df_from_freqs(spark, [1, 1, 1]), "k"
    ).collect()[0]
    assert out.h_chao_shen is None
    assert out.h_plugin is not None
