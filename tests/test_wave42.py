"""Wave-42 tests: association-rule math on a known basket set,
NB confusion on separable labels, HITS on a hand graph, LPA merging
two triangles, diversity on a skewed corpus."""

from __future__ import annotations

import math


def test_association_rules_known_baskets(spark):
    from mcas_question2_etl_spark.operators.assoc import association_rules

    # baskets: {1,2} x3, {1,3} x1, {2,3} x1  -> N = 5
    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 2),
        (13, 1), (13, 3),
        (14, 2), (14, 3),
    ]
    df = spark.createDataFrame(rows, ["g", "it"])
    out = {(r.item_a, r.item_b): r for r in
           association_rules(df, "g", "it", min_support=2).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert (r.n_ab, r.n_a, r.n_b) == (3, 4, 4)
    assert math.isclose(r.conf_a_b, 0.75, rel_tol=1e-12)
    assert math.isclose(r.lift, 3 * 5 / 16.0, rel_tol=1e-12)


def test_association_rules_dedups_lines_and_caps_groups(spark):
    from mcas_question2_etl_spark.operators.assoc import association_rules

    # duplicate line items must not inflate support; the 9-item basket
    # is dropped whole by max_group=8
    rows = [(1, 1), (1, 1), (1, 2), (2, 1), (2, 2)] + [(3, i) for i in range(9)]
    df = spark.createDataFrame(rows, ["g", "it"])
    out = association_rules(df, "g", "it", min_support=2).collect()
    assert len(out) == 1 and out[0].n_ab == 2


def test_nbayes_separable_sources(spark):
    from mcas_question2_etl_spark.operators.nbayes import nbayes_confusion

    rows = [
        (1, "apple apple banana", "fruit"),
        (2, "banana apple apple", "fruit"),
        (3, "bolt nut bolt", "hardware"),
        (4, "nut bolt nut", "hardware"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {(r.actual, r.predicted): r.n_docs for r in
           nbayes_confusion(df).collect()}
    assert out == {("fruit", "fruit"): 2, ("hardware", "hardware"): 2}


def test_hits_star_concentrates_authority(spark):
    from mcas_question2_etl_spark.operators.graph_metrics import hits_authorities

    # hubs 1..3 all buy from supplier 100; only hub 1 also buys 200
    rows = [(1, 100, 2), (2, 100, 2), (3, 100, 2), (1, 200, 1)]
    df = spark.createDataFrame(rows, ["hub", "auth", "w"])
    out = {r.auth: r.authority for r in hits_authorities(df, rounds=2).collect()}
    assert math.isclose(out[100], 1.0, rel_tol=1e-12)
    # a1: 100->6, 200->1; h1: h1=2*6+1*1=13, h2=h3=12; a2(200)=1*13=13,
    # a2(100)=2*13+2*12+2*12=74
    assert math.isclose(out[200], 13 / 74, rel_tol=1e-12)


def test_lpa_two_triangles_bridge(spark):
    from mcas_question2_etl_spark.operators.community import label_propagation

    # two triangles {1,2,3} and {7,8,9}: each collapses to its min label
    rows = [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {r.community: r.n_members for r in
           label_propagation(df, rounds=2).collect()}
    assert out == {1: 3, 7: 3}


def test_token_diversity_exact_simpson(spark):
    from mcas_question2_etl_spark.operators.entropy import (
        token_diversity_by_source,
    )

    rows = [
        (1, "a a a b", "s1"),       # counts 3,1 -> 16/10
        (2, "x y z w", "s2"),       # uniform 4 -> 16/4 = 4
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r for r in token_diversity_by_source(df).collect()}
    assert (out["s1"].n_tokens, out["s1"].vocab) == (4, 2)
    assert math.isclose(out["s1"].effective_vocab_q2, 1.6, rel_tol=1e-12)
    assert math.isclose(out["s2"].effective_vocab_q2, 4.0, rel_tol=1e-12)
