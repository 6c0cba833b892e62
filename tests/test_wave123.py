"""Wave 123 — RFF-MMD kernel two-sample drift test.

Tests for operators/mmd.py: the RFF feature map approximates the RBF
kernel; MMD² separates shifted populations and vanishes on identical
ones; W/b parameter determinism; exact Spark-vs-DuckDB twin equality.
Spec: mmd_rff_label_drift (plans/curation_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from mcas_question2_etl_spark.operators import mmd as M

DIM = 8
D = 64  # more features -> tighter kernel approximation in the test


def _vecs(n, shift, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(n, DIM) + shift


def test_rff_params_deterministic():
    w1, b1 = M.rff_params(DIM, 16, 4.0)
    w2, b2 = M.rff_params(DIM, 16, 4.0)
    assert w1 == w2 and b1 == b2
    assert len(w1) == 16 and len(w1[0]) == DIM and len(b1) == 16
    # Gaussians: roughly zero-mean, sd ~ 1/sigma
    flat = [v for row in w1 for v in row]
    assert abs(sum(flat) / len(flat)) < 0.1
    assert all(0 <= x < 2 * math.pi for x in b1)


def test_rff_approximates_rbf_kernel():
    """E[z(x)·z(y)] = exp(-||x-y||²/(2σ²)); with D=256 features the
    error is O(1/sqrt(D))."""
    sigma = 2.0
    w, b = M.rff_params(DIM, 256, sigma)
    W = np.array(w)
    bb = np.array(b)
    rng = np.random.RandomState(0)
    scale = math.sqrt(2.0 / 256)
    for _ in range(5):
        x, y = rng.randn(DIM), rng.randn(DIM)
        zx = scale * np.cos(W @ x + bb)
        zy = scale * np.cos(W @ y + bb)
        k_true = math.exp(-np.sum((x - y) ** 2) / (2 * sigma**2))
        assert zx @ zy == pytest.approx(k_true, abs=0.15)


def _mmd_spark(spark, xs, ys, sigma=2.0, n_features=D):
    rows = [(True, [float(v) for v in x]) for x in xs] + [
        (False, [float(v) for v in y]) for y in ys
    ]
    df = spark.createDataFrame(rows, "p boolean, embedding array<double>")
    from pyspark.sql import functions as F

    return (
        M.mmd_rff(
            df, F.col("p"), n_features=n_features, sigma=sigma, dim=DIM
        )
        .collect()[0]
    )


def test_mmd_separates_shifted_populations(spark):
    same = _mmd_spark(spark, _vecs(300, 0.0, 1), _vecs(300, 0.0, 2))
    far = _mmd_spark(spark, _vecs(300, 0.0, 1), _vecs(300, 2.0, 2))
    assert far.mmd2 > 10 * max(same.mmd2, 1e-9)
    assert far.mmd_scaled > same.mmd_scaled
    assert (same.n_p, same.n_q) == (300, 300)


def test_mmd_identical_population_is_tiny(spark):
    xs = _vecs(400, 0.0, 7)
    r = _mmd_spark(spark, xs[::2], xs[1::2])
    assert r.mmd2 < 0.02


def test_sql_twin_matches_spark_exactly(spark):
    xs, ys = _vecs(60, 0.0, 3), _vecs(50, 1.0, 4)
    r = _mmd_spark(spark, xs, ys, n_features=16)
    con = duckdb.connect()
    con.execute("CREATE TABLE e0 (p BOOLEAN, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO e0 VALUES (?, ?)",
        [(True, [float(v) for v in x]) for x in xs]
        + [(False, [float(v) for v in y]) for y in ys],
    )
    row = con.execute(
        M.mmd_rff_sql(
            "SELECT p, embedding FROM e0", "p",
            n_features=16, sigma=2.0, dim=DIM,
        )
    ).fetchone()
    assert row == (r.n_p, r.n_q, r.mmd2, r.mmd_scaled)
