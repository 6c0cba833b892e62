"""Wave 169 — linear CKA representation similarity.

Hand-pinned numpy recomputation of the textbook kernel-space CKA
(the d x d Gram route must equal the n x n HSIC route exactly —
that identity IS the implementation's correctness argument),
invariance properties (orthogonal rotation of the prefix dims and
global scaling leave CKA unchanged; an uncorrelated random prefix
drives it toward 0), and SQL-twin equality. Spec:
cka_mrl_prefix_geometry (plans/curation_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import numpy as np
import duckdb
import pytest

from mcas_question2_etl_spark.operators.similarity import (
    linear_cka_prefix,
    linear_cka_prefix_sql,
)


def _df(spark, mat):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _cka_numpy(x, y):
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)
    num = np.linalg.norm(yc.T @ xc, "fro") ** 2
    den = np.linalg.norm(xc.T @ xc, "fro") * np.linalg.norm(
        yc.T @ yc, "fro"
    )
    return num / den


def _mat(n, d, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d)).astype(np.float32)
    return m


def test_matches_textbook_definition(spark):
    m = _mat(60, 12)
    r = linear_cka_prefix(_df(spark, m), prefix_dim=4).collect()[0]
    expected = _cka_numpy(
        m.astype(np.float64), m[:, :4].astype(np.float64)
    )
    assert (r.n_vecs, r.full_dim, r.prefix_dim) == (60, 12, 4)
    assert r.cka == pytest.approx(round(expected, 6), abs=1e-6)


def test_identity_prefix_is_one_and_noise_is_low(spark):
    m = _mat(80, 8, seed=5)
    # prefix == full representation -> CKA exactly 1
    r_full = linear_cka_prefix(_df(spark, m), prefix_dim=8).collect()[0]
    assert r_full.cka == pytest.approx(1.0, abs=1e-9)
    # prefix = independent noise while the REST of the vector carries
    # 100x the variance: the full-representation geometry is dominated
    # by dims the prefix cannot see -> CKA small (note Y is a subset
    # of X's columns, so it is never exactly 0)
    noisy = m.copy()
    noisy[:, :4] = _mat(80, 4, seed=99)
    noisy[:, 4:] *= 100.0
    r_noise = linear_cka_prefix(_df(spark, noisy), prefix_dim=4).collect()[0]
    expected = _cka_numpy(
        noisy.astype(np.float64), noisy[:, :4].astype(np.float64)
    )
    assert r_noise.cka == pytest.approx(round(expected, 6), abs=1e-6)
    assert r_noise.cka < 0.2


def test_sql_twin_matches_spark_exactly(spark):
    m = _mat(50, 10, seed=11)
    r = linear_cka_prefix(_df(spark, m), prefix_dim=3).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(i, [float(x) for x in row]) for i, row in enumerate(m)],
    )
    row = con.execute(
        linear_cka_prefix_sql(prefix_dim=3)
    ).fetchone()
    assert row == (r.n_vecs, r.full_dim, r.prefix_dim, r.cka)
