"""Unit tests for wave-20: NDCG@k properties and a hand-computed pin."""

from __future__ import annotations

import math

import pytest


def test_ndcg_hand_computed(spark):
    """Tiny fixture pinned against the textbook computation, including
    a query whose ranking is already ideal (ndcg == 1)."""
    from mcas_question2_etl_spark.operators.evaluation import ndcg_at_k

    rows = [
        # q1: score order (d1,d2,d3) rel (3,1,2) -> NOT ideal
        ("q1", 1, 0.9, 3),
        ("q1", 2, 0.8, 1),
        ("q1", 3, 0.7, 2),
        # q2: score order matches rel order -> ideal, ndcg = 1
        ("q2", 1, 0.9, 5),
        ("q2", 2, 0.5, 2),
    ]
    df = spark.createDataFrame(rows, "qid string, doc long, score double, rel long")
    got = {r.qid: r for r in ndcg_at_k(df, "qid", "score", "rel", 10).collect()}

    def g(rel):
        return 2.0**rel - 1

    dcg1 = g(3) / math.log2(2) + g(1) / math.log2(3) + g(2) / math.log2(4)
    idcg1 = g(3) / math.log2(2) + g(2) / math.log2(3) + g(1) / math.log2(4)
    assert got["q1"].dcg == pytest.approx(dcg1)
    assert got["q1"].idcg == pytest.approx(idcg1)
    assert got["q1"].ndcg == pytest.approx(dcg1 / idcg1)
    assert got["q1"].ndcg < 1.0
    assert got["q2"].ndcg == pytest.approx(1.0)


def test_ndcg_bounds_on_real_retrieval(spark):
    from mcas_question2_etl_spark.plans.text_analytics import _TERMS, ndcg_retrieval_eval
    from tests.conftest import SF_SMALL

    rows = ndcg_retrieval_eval(spark, SF_SMALL).collect()
    assert sorted(r.qid for r in rows) == sorted(_TERMS)
    for r in rows:
        assert 0.0 < r.ndcg <= 1.0 + 1e-12
        assert r.dcg <= r.idcg + 1e-9
