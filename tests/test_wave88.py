"""Wave-88 hand pins: exact matrix profile and the JL projection
distortion audit. Expected values recomputed independently in-test:
the matrix profile by a brute-force numpy z-normalized-distance scan,
the JL report by a numpy projection with the same pinned sign matrix
(plus the structural JL properties: mean ratio near 1, exact-duplicate
subsequences at distance 0).

Covered spec names: matrix_profile_daily, jl_projection_distortion.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators import similarity as sim
from mcas_question2_etl_spark.operators import timeseries as ts


def _daily_df(spark, ys):
    return spark.createDataFrame(
        [(i + 100, float(y)) for i, y in enumerate(ys)],
        "day long, y double",
    )


def _ref_matrix_profile(ys, m):
    y = np.asarray(ys, dtype=float)
    n = len(y)
    nsub = n - m + 1
    subs = np.array([y[i : i + m] for i in range(nsub)])
    out = {}
    for i in range(nsub):
        best = None
        for j in range(nsub):
            if abs(i - j) <= m // 2:
                continue
            a, b = subs[i], subs[j]
            sa, sb = a.sum(), b.sum()
            ssa, ssb = (a * a).sum(), (b * b).sum()
            dot = (a * b).sum()
            var_a = ssa - sa * sa / m
            var_b = ssb - sb * sb / m
            rho = (dot - sa * sb / m) / math.sqrt(var_a * var_b)
            d = math.sqrt(max(0.0, 2.0 * m * (1.0 - rho)))
            if best is None or (d, j) < best:
                best = (d, j)
        out[i + 1] = (best[1] + 1, best[0])  # 1-indexed like the engine
    return out


def test_matrix_profile_matches_bruteforce(spark):
    rng = np.random.RandomState(2)
    ys = list(rng.rand(40) * 100)
    got = {
        r.i: (r.nn_index, r.profile_dist)
        for r in ts.matrix_profile(
            _daily_df(spark, ys), "day", "y", m=7
        ).collect()
    }
    want = _ref_matrix_profile(ys, 7)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], f"nn_index differs at i={i}"
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6)


def test_matrix_profile_motif_discord_structure(spark):
    # plant an identical motif at i=1 and i=21 (0 distance), and a
    # one-off spike week that must be the top discord
    base = [10.0, 12.0, 11.0, 13.0, 12.5, 11.5, 10.5]
    rng = np.random.RandomState(4)
    ys = list(rng.rand(35) * 3 + 20)
    ys[0:7] = base
    ys[20:27] = base
    ys[13] = 500.0  # spike -> weeks covering index 13 are anomalous
    got = {
        r.i: (r.nn_index, r.profile_dist)
        for r in ts.matrix_profile(
            _daily_df(spark, ys), "day", "y", m=7
        ).collect()
    }
    want = _ref_matrix_profile(ys, 7)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6)
    # the planted motif pair found each other at distance ~0
    assert got[1][0] == 21 and got[1][1] == pytest.approx(0.0, abs=1e-6)
    assert got[21][0] == 1 and got[21][1] == pytest.approx(0.0, abs=1e-6)
    # the discord (max profile) is a spike-adjacent window: subsequences
    # i in [8, 14] contain the spike itself and their immediate
    # neighbors are distorted by it (z-normalization makes a window
    # BESIDE a spike as anomalous as one containing it)
    discord_i = max(got, key=lambda i: got[i][1])
    assert discord_i in range(8, 16)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_jl_signs_are_pinned_and_balanced():
    s1 = sim._jl_sign_matrix(16, 64)
    s2 = sim._jl_sign_matrix(16, 64)
    assert s1 == s2  # deterministic artifact
    flat = [v for row in s1 for v in row]
    assert set(flat) == {-1, 1}
    # md5 bits are balanced: neither sign dominates grossly
    pos = sum(1 for v in flat if v == 1)
    assert 0.4 < pos / len(flat) < 0.6


def test_jl_distortion_matches_numpy_projection(spark):
    rng = np.random.RandomState(6)
    # float32 round-trip: the engine reads array<float>, so quantize
    # the fixture the same way before the numpy reference
    vecs = rng.randn(30, 64).astype(np.float32)
    df = _emb_df(spark, vecs)
    out = sim.jl_distortion_report(
        df, k=16, dim=64, id_mod=1, id_cap=1000
    ).collect()[0]
    S = np.array(sim._jl_sign_matrix(16, 64), dtype=float)
    V = vecs.astype(float)
    Z = V @ S.T
    ratios = []
    for i in range(len(V)):
        for j in range(i + 1, len(V)):
            dz = ((Z[i] - Z[j]) ** 2).sum() / 16.0
            dv = ((V[i] - V[j]) ** 2).sum()
            ratios.append(dz / dv)
    ratios = np.array(ratios)
    assert out.n_pairs == len(ratios)
    assert out.mean_ratio == pytest.approx(ratios.mean(), abs=1e-5)
    assert out.min_ratio == pytest.approx(ratios.min(), abs=1e-5)
    assert out.max_ratio == pytest.approx(ratios.max(), abs=1e-5)
    # the JL property itself: concentration around 1
    assert 0.5 < out.mean_ratio < 1.5
