"""Wave-110 hand pins: the explicit-DFT audio spectral profile.
Against a numpy FFT reference on constructed envelopes, plus the
physics poles: a pure tone at bin k puts the centroid AT k with
near-zero flatness, an impulse is spectrally white (flatness 1,
centroid at the bin midpoint), and a constant (DC-only) envelope has
zero band power and NULL read-outs rather than a 0/0.

Covered spec names: audio_spectral_profile.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.multimodal import spectral_profile

_N = 64
_KMAX = 8


def _frames_df(spark, envs):
    rows = [
        (mid, n, float(e))
        for mid, env in envs.items()
        for n, e in enumerate(env)
    ]
    return spark.createDataFrame(
        rows, "media_id long, frame long, energy double"
    )


def _ref(env):
    x = np.asarray(env, dtype=float)
    X = np.fft.fft(x)
    p = np.abs(X[1 : _KMAX + 1]) ** 2
    total = p.sum()
    if total <= 0:
        return total, None, None
    centroid = (np.arange(1, _KMAX + 1) * p).sum() / total
    if (p <= 0).any():
        return total, centroid, None
    flat = math.exp(np.log(p).mean()) / p.mean()
    return total, centroid, flat


def test_matches_fft_reference(spark):
    rng = np.random.RandomState(31)
    envs = {0: rng.rand(_N) * 15, 1: rng.rand(_N) * 15}
    out = spectral_profile(_frames_df(spark, envs)).collect()
    for r in out:
        total, cent, flat = _ref(envs[r.media_id])
        assert r.total_power == pytest.approx(total, abs=1e-4)
        assert r.spectral_centroid == pytest.approx(cent, abs=1e-6)
        assert r.spectral_flatness == pytest.approx(flat, abs=1e-6)


def test_pure_tone_centroid_at_bin(spark):
    for k in (2, 5):
        env = [
            8.0 + 7.0 * math.cos(2 * math.pi * k * n / _N)
            for n in range(_N)
        ]
        out = spectral_profile(_frames_df(spark, {0: env})).collect()[0]
        # essentially all band power in bin k
        assert out.spectral_centroid == pytest.approx(k, abs=1e-6)
        total, cent, flat = _ref(env)
        assert out.total_power == pytest.approx(total, abs=1e-4)


def test_impulse_is_white(spark):
    env = [0.0] * _N
    env[0] = 15.0
    out = spectral_profile(_frames_df(spark, {0: env})).collect()[0]
    # impulse: |X_k| identical for every k -> flatness exactly 1 and
    # centroid at the arithmetic bin mean
    assert out.spectral_flatness == pytest.approx(1.0, abs=1e-9)
    assert out.spectral_centroid == pytest.approx(
        sum(range(1, _KMAX + 1)) / _KMAX, abs=1e-9
    )


def test_constant_envelope_null_not_div_zero(spark):
    env = [7.0] * _N
    out = spectral_profile(_frames_df(spark, {0: env})).collect()[0]
    assert out.total_power == pytest.approx(0.0, abs=1e-9)
    assert out.spectral_centroid is None
    assert out.spectral_flatness is None
