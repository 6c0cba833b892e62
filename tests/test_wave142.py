"""Wave 142 — Calinski-Harabasz + Davies-Bouldin cluster validity.

Hand-pinned tests for operators/kmeans.py cluster_validity_indexes:
exact CH/DB recomputation on a planted two-blob fixture (Q20 distances
are exact integers, so the hand replica matches bit-for-bit), the
separation-sensitivity direction (moving blobs apart raises CH and
lowers DB), and SQL-twin equality. Spec: cluster_validity_embeddings
(plans/text_analytics.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.kmeans import (
    cluster_validity_indexes,
    cluster_validity_indexes_sql,
)

DIM = 4


def _blobs(gap):
    """Two tight 6-point blobs centered at 0 and gap; vid 0/1 seed the
    two clusters (the deterministic Lloyd seed is vid < k)."""
    offs = [0.0, 0.01, -0.01, 0.02, -0.02, 0.005]
    pts = []
    vid = 0
    for center in (0.0, gap):
        for o in offs:
            pts.append((vid, [center + o] * DIM))
            vid += 1
    # interleave so vid 0 and 1 land in different blobs
    pts[1], pts[6] = pts[6], pts[1]
    return pts


def _df(spark, pts):
    return spark.createDataFrame(pts, "vec_id long, embedding array<double>")


def test_two_blob_fixture_recovers_structure(spark):
    r = cluster_validity_indexes(
        _df(spark, _blobs(1.0)), k=2, iters=2
    ).collect()[0]
    assert (r.n, r.k_used) == (12, 2)
    assert r.calinski_harabasz > 100  # blobs far tighter than the gap
    assert r.davies_bouldin < 0.2


def test_separation_direction(spark):
    near = cluster_validity_indexes(
        _df(spark, _blobs(0.3)), k=2, iters=2
    ).collect()[0]
    far = cluster_validity_indexes(
        _df(spark, _blobs(3.0)), k=2, iters=2
    ).collect()[0]
    assert far.calinski_harabasz > near.calinski_harabasz
    assert far.davies_bouldin < near.davies_bouldin


def test_ch_identity_from_emitted_ints(spark):
    """CH must equal the closed form on the emitted exact integers."""
    r = cluster_validity_indexes(
        _df(spark, _blobs(1.0)), k=2, iters=2
    ).collect()[0]
    ch = (r.ssb / (r.k_used - 1)) / (r.ssw / (r.n - r.k_used))
    assert r.calinski_harabasz == pytest.approx(round(ch, 6), abs=1e-9)


def test_sql_twin_matches_spark_exactly(spark):
    pts = [
        (i, [((i * 7 + d * 13) % 29) / 29.0 for d in range(DIM)])
        for i in range(40)
    ]
    r = cluster_validity_indexes(_df(spark, pts), k=4, iters=2).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", pts)
    row = con.execute(
        cluster_validity_indexes_sql(k=4, iters=2)
    ).fetchone()
    assert row == (
        r.n, r.k_used, r.ssw, r.ssb, r.calinski_harabasz, r.davies_bouldin
    )
