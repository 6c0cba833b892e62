"""Unit/property tests for wave-14 operators: interval overlap join,
Poisson bootstrap, scalar-quantized ANN, hypertable rollup chain,
bigram LM scoring."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _brute_overlaps(lefts, rights):
    return sorted(
        (l[0], r[0])
        for l in lefts
        for r in rights
        if l[1] <= r[2] and r[1] <= l[2]
    )


@pytest.mark.parametrize("bin_width", [1, 7, 50, 1000])
def test_overlap_join_equals_brute_force(spark, bin_width):
    """Grid-binned overlap join = brute-force theta join for every bin
    width (coarser/finer than the interval lengths, incl. degenerate
    one-bin-per-pair widths): each pair exactly once, none lost."""
    from mcas_question2_etl_spark.operators.intervals import overlap_join

    rng = random.Random(42)
    lefts = [
        (i, s, s + rng.randrange(0, 40))
        for i, s in ((i, rng.randrange(0, 500)) for i in range(60))
    ]
    rights = [
        (i, s, s + rng.randrange(0, 40))
        for i, s in ((i, rng.randrange(0, 500)) for i in range(60))
    ]
    ldf = spark.createDataFrame(lefts, "l_id long, l_s long, l_e long")
    rdf = spark.createDataFrame(rights, "r_id long, r_s long, r_e long")
    got = sorted(
        (r.l_id, r.r_id)
        for r in overlap_join(ldf, rdf, "l_s", "l_e", "r_s", "r_e", bin_width)
        .select("l_id", "r_id")
        .collect()
    )
    assert got == _brute_overlaps(lefts, rights)


def test_overlap_join_zero_length_intervals(spark):
    """Point intervals (start == end) join iff the point lies inside
    the other interval — the session-of-one-event case."""
    from mcas_question2_etl_spark.operators.intervals import overlap_join

    ldf = spark.createDataFrame([(1, 10, 10), (2, 99, 99)], "l_id long, l_s long, l_e long")
    rdf = spark.createDataFrame([(7, 5, 15)], "r_id long, r_s long, r_e long")
    got = sorted(
        (r.l_id, r.r_id)
        for r in overlap_join(ldf, rdf, "l_s", "l_e", "r_s", "r_e", 4)
        .select("l_id", "r_id")
        .collect()
    )
    assert got == [(1, 7)]


def test_poisson_bootstrap_weights_behave(spark):
    """Per-replica effective n stays near the true n (Poisson(1) mean
    1), estimates are deterministic across runs, and the replicate
    spread brackets the true mean."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.bootstrap import (
        poisson_bootstrap_means,
    )
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    n = docs.count()
    true_mean = docs.agg(F.avg("n_chars")).first()[0]
    rows = poisson_bootstrap_means(docs, "doc_id", "n_chars").collect()
    assert len(rows) == 32
    for r in rows:
        # Poisson(1) sum concentrates: sd = sqrt(n), allow 5 sd
        assert abs(r.n_eff - n) <= 5 * math.sqrt(n) + 1
        assert r.est_mean == pytest.approx(r.wsum / r.n_eff)
    means = sorted(r.est_mean for r in rows)
    assert means[0] <= true_mean <= means[-1]
    again = poisson_bootstrap_means(docs, "doc_id", "n_chars").collect()
    assert sorted(r.est_mean for r in again) == means


def test_sq_topk_recall_vs_exact(spark):
    """8-bit scalar quantization keeps >= 7 of the exact top-10 (64-dim
    unit vectors; SQ8 recall on real embeddings is typically ~1.0)."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.similarity import (
        brute_force_topk,
        sq_topk,
    )
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    exact = {r.vec_id for r in brute_force_topk(emb, query_vec_id=7, k=10).collect()}
    approx = {r.vec_id for r in sq_topk(emb, query_vec_id=7, k=10).collect()}
    assert len(exact & approx) >= 7


def test_rollup_chain_matches_direct(spark):
    """day-from-hourly == day-from-raw: the continuous-aggregate chain
    loses nothing (also via a week grain stacked on the day grain)."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.timeseries import (
        rollup_coarser,
        time_bucket_rollup,
    )
    from tests.conftest import SF_SMALL

    events = load_table(spark, SF_SMALL, "events")
    hourly = time_bucket_rollup(events, "ts", ["event_type"], 3600, "user_id")
    day_from_hour = rollup_coarser(hourly, ["event_type"], 86400)
    day_direct = time_bucket_rollup(events, "ts", ["event_type"], 86400, "user_id")
    key = lambda r: (r.event_type, r.bucket_us)
    assert sorted(map(tuple, day_from_hour.collect())) == sorted(
        map(tuple, day_direct.collect())
    )
    week_chain = rollup_coarser(day_from_hour, ["event_type"], 7 * 86400)
    week_direct = time_bucket_rollup(events, "ts", ["event_type"], 7 * 86400, "user_id")
    assert sorted(map(tuple, week_chain.collect())) == sorted(
        map(tuple, week_direct.collect())
    )


def test_bigram_logprob_hand_computed(spark):
    """Tiny corpus pinned against hand-computed add-one bigram NLL."""
    from mcas_question2_etl_spark.operators.text import bigram_logprob_quality

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # corpus bigrams: d1: (a,b)(b,a)(a,b)  d2: (a,b)(b,c)
    # c12: (a,b)=3 (b,a)=1 (b,c)=1 ; c1: a=3, b=2 ; V = 3 (a,b,c)
    rows = {r.doc_id: r for r in bigram_logprob_quality(docs).collect()}
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    exp1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert rows[1].n_bigrams == 3
    assert rows[2].n_bigrams == 2
    assert rows[1].mean_nll == pytest.approx(exp1)
    assert rows[2].mean_nll == pytest.approx(exp2)
