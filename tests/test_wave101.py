"""Wave-101 hand pins: ERR@k (cascade) and RBP. Both against
plain-Python references on hand-built rankings, plus the defining
poles — a maximal-grade hit at rank 1 makes the cascade stop (ERR
collapses toward 15/16 and later hits add almost nothing, which
additive NDCG cannot represent), and a single relevant document at
rank r scores RBP = (1-p)*p^(r-1) exactly.

Covered spec names: err_rbp_retrieval.
"""

from __future__ import annotations

import math

import pytest

from mcas_question2_etl_spark.operators.evaluation import err_rbp


def _cands_df(spark, rows):
    # rows: (qid, doc_id, score, rel)
    return spark.createDataFrame(
        rows, "qid string, doc_id long, score double, rel long"
    )


def _ref(rows, k=10, g_cap=4, p=0.8):
    by_q = {}
    for qid, doc, score, rel in rows:
        by_q.setdefault(qid, []).append((score, doc, rel))
    out = {}
    for qid, docs in by_q.items():
        ranked = sorted(docs, key=lambda x: (-x[0], x[1]))
        err = 0.0
        surv = 1.0
        rbp = 0.0
        for r, (_, _, rel) in enumerate(ranked, start=1):
            big_r = (2.0 ** min(rel, g_cap) - 1.0) / 2.0**g_cap
            if r <= k:
                err += surv * big_r / r
            surv *= 1.0 - big_r
            if rel >= 2:
                rbp += p ** (r - 1)
        out[qid] = (len(ranked), err, (1.0 - p) * rbp)
    return out


def test_matches_reference_mixed_ranking(spark):
    rows = [
        ("q", 1, 0.9, 3),
        ("q", 2, 0.8, 0),
        ("q", 3, 0.7, 4),
        ("q", 4, 0.6, 1),
        ("q", 5, 0.5, 2),
        ("q", 6, 0.4, 7),  # grade capped at 4
        ("q", 7, 0.3, 0),
    ]
    out = err_rbp(_cands_df(spark, rows)).collect()[0]
    n, err, rbp = _ref(rows)["q"]
    assert out.n_cands == n
    assert out.err_at_k == pytest.approx(err, abs=1e-6)
    assert out.rbp == pytest.approx(rbp, abs=1e-6)


def test_cascade_stops_after_perfect_hit(spark):
    # a grade-4 doc at rank 1: stop prob 15/16, so ERR >= 15/16 and
    # everything after contributes < 1/16 total
    rows = [("q", 1, 1.0, 4)] + [
        ("q", i, 1.0 - 0.01 * i, 4) for i in range(2, 8)
    ]
    out = err_rbp(_cands_df(spark, rows)).collect()[0]
    n, err, _ = _ref(rows)["q"]
    assert out.err_at_k == pytest.approx(err, abs=1e-6)
    assert 15.0 / 16.0 <= out.err_at_k < 1.0


def test_single_relevant_rbp_geometric(spark):
    for rank in (1, 3, 6):
        rows = [
            ("q", i, 1.0 - 0.1 * i, 2 if i == rank else 0)
            for i in range(1, 9)
        ]
        out = err_rbp(_cands_df(spark, rows)).collect()[0]
        assert out.rbp == pytest.approx(
            0.2 * 0.8 ** (rank - 1), abs=1e-9
        )


def test_all_irrelevant_is_zero(spark):
    rows = [("q", i, 1.0 / i, 0) for i in range(1, 6)]
    out = err_rbp(_cands_df(spark, rows)).collect()[0]
    assert out.err_at_k == pytest.approx(0.0, abs=1e-12)
    assert out.rbp == pytest.approx(0.0, abs=1e-12)


def test_tie_break_by_doc_id(spark):
    # equal scores: doc_id ascending decides, so the grade-4 doc at
    # the smaller id is rank 1
    rows = [("q", 10, 0.5, 0), ("q", 2, 0.5, 4), ("q", 7, 0.5, 0)]
    out = err_rbp(_cands_df(spark, rows)).collect()[0]
    n, err, rbp = _ref(rows)["q"]
    assert out.err_at_k == pytest.approx(err, abs=1e-9)
    assert out.err_at_k == pytest.approx(15.0 / 16.0, abs=1e-9)
