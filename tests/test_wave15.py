"""Unit/property tests for wave-15 operators: deletion-neighborhood
edit-distance join, IVF-SQ composition, histogram join-cardinality."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_equals_brute_force(spark):
    """Deletion-neighborhood blocking has recall exactly 1 on a random
    corpus over a tiny alphabet (maximizes collisions, duplicates, and
    off-by-one lengths; includes the empty string)."""
    from mcas_question2_etl_spark.operators.editjoin import edit_distance_pairs

    rng = random.Random(7)
    strs = [""] + [
        "".join(rng.choice("ab") for _ in range(rng.randrange(0, 6)))
        for _ in range(80)
    ]
    rows = [(i, s) for i, s in enumerate(strs)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.a_id, r.b_id, r.dist)
        for r in edit_distance_pairs(df, "id", "s").collect()
    )
    want = sorted(
        (i, j, _lev(si, sj))
        for (i, si), (j, sj) in itertools.combinations(rows, 2)
        if _lev(si, sj) <= 1
    )
    assert got == want


def test_ivf_sq_matches_sq_ranking_within_cell(spark):
    """IVF-SQ returns the SQ-ADC ranking restricted to the query's IVF
    cell: every returned id must be in the ivf cell result, ranked by
    the same sq_dist the full-table SQ scan assigns it."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.similarity import (
        ivf_sq_topk,
        ivf_topk,
        sq_topk,
    )
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    composed = ivf_sq_topk(emb, query_vec_id=1, k=5, n_centroids=8).collect()
    cell_ids = {
        r.vec_id for r in ivf_topk(emb, query_vec_id=1, k=10**6, n_centroids=8).collect()
    }
    sq_dist_all = {
        r.vec_id: r.sq_dist
        for r in sq_topk(emb, query_vec_id=1, k=10**6).collect()
    }
    assert len(composed) == 5
    for r in composed:
        assert r.vec_id in cell_ids
        assert r.sq_dist == sq_dist_all[r.vec_id]
    dists = [r.sq_dist for r in composed]
    assert dists == sorted(dists)


def test_join_cardinality_matches_real_join(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.curation_specs import join_cardinality_estimate
    from tests.conftest import SF_SMALL

    est = join_cardinality_estimate(spark, SF_SMALL).first()
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    real = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert est.join_rows == real
