"""Wave-55 tests: RAKE textbook behavior, drift bounds, burstiness
math, SRM accounting, negative-sampling invariants."""

from __future__ import annotations

import math


def test_rake_scores_multiword_phrases(spark):
    from mcas_question2_etl_spark.operators.text import rake_keywords

    # "deep learning" appears 3x as a phrase; "systems" alone 3x.
    docs = [
        "the deep learning of it",
        "deep learning is a deep learning",
        "systems and systems of systems",
    ]
    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    out = {r.phrase: r for r in
           rake_keywords(df, min_occurrences=3).collect()}
    assert "deep learning" in out
    r = out["deep learning"]
    assert r.n_occurrences == 3 and r.n_words == 2
    # deg(deep)=6, freq(deep)=3; deg(learning)=6, freq(learning)=3
    # score = 2 + 2 = 4
    assert math.isclose(r.score, 4.0, rel_tol=1e-9)
    # unigram phrases are excluded (n_words > 1 filter)
    assert "systems" not in out


def test_sliding_vocab_drift_identical_buckets(spark):
    from mcas_question2_etl_spark.operators.text import sliding_vocab_drift

    # ids 0..9 in 5 buckets of 2 docs; all docs same text -> jaccard 1
    df = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)], ["doc_id", "text"]
    )
    out = sliding_vocab_drift(df).collect()
    assert len(out) == 4
    assert all(r.jaccard == 1.0 and r.n_common == 3 for r in out)


def test_sliding_vocab_drift_disjoint(spark):
    from mcas_question2_etl_spark.operators.text import sliding_vocab_drift

    rows = [(i, f"tok{i // 2}x tok{i // 2}y") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sliding_vocab_drift(df).collect()
    # consecutive buckets share no tokens -> no inter rows survive the
    # inner join; jaccard table is empty
    assert out == []


def test_token_burstiness_math(spark):
    from mcas_question2_etl_spark.operators.text import token_burstiness_report

    # "spam" 5x in one doc + 1x in another; "even" once in each of 2
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam even"), (2, "spam even")],
        ["doc_id", "text"],
    )
    out = {r.token: r for r in
           token_burstiness_report(df, min_df=2).collect()}
    assert out["spam"].cf == 6 and out["spam"].df == 2
    assert math.isclose(out["spam"].burstiness, 3.0, rel_tol=1e-12)
    assert math.isclose(out["even"].burstiness, 1.0, rel_tol=1e-12)


def test_srm_check_accounting(spark):
    from mcas_question2_etl_spark.operators.evaluation import srm_check

    df = spark.createDataFrame([(u,) for u in range(1000)], ["user_id"])
    out = srm_check(df, "user_id").collect()
    assert len(out) == 2
    assert sum(r.n_units for r in out) == 1000
    assert all(r.expected == 500.0 for r in out)
    # a fair hash split of 1000 should not trip the 1% SRM flag
    assert all(not r.srm_flag for r in out)
    chi = out[0].chi2
    d = out[0].n_units - 500
    assert math.isclose(chi, 2 * d * d / 500, rel_tol=1e-9)


def test_negative_sampling_invariants(spark):
    from mcas_question2_etl_spark.operators.sampling import (
        negative_sampling_pairs,
    )

    df = spark.createDataFrame([(i,) for i in range(10, 30)], ["doc_id"])
    out = negative_sampling_pairs(df, "doc_id", k=3).collect()
    assert len(out) == 20 * 3
    for r in out:
        assert r.negative != r.anchor
        assert 10 <= r.negative <= 29
    # deterministic: same call yields identical pairs
    again = negative_sampling_pairs(df, "doc_id", k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
