"""Wave 155 — Min-K% Prob membership/contamination signal.

Hand-pinned tail selection on a tiny corpus, the membership property
(a doc made ONLY of corpus-common tokens outranks a doc with one rare
token even when their overall means are close), k-ceil edge cases,
deterministic tie handling, and SQL-twin equality via the registered
spec's oracle at sf0.001. Spec: mink_prob_membership_docs
(plans/text_analytics.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.text import (
    mink_prob_membership,
    mink_prob_membership_sql,
)


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _hand(docs, k_pct=0.2):
    toks = [(i, t) for i, s in docs for t in s.split(" ")]
    n = len(toks)
    from collections import Counter

    cnt = Counter(t for _, t in toks)
    out = {}
    for i, s in docs:
        nll = sorted(
            (-math.log(cnt[t] / n), t) for t in s.split(" ")
        )
        nll = sorted(nll, key=lambda p: (-p[0], p[1]))
        m = math.ceil(len(nll) * k_pct)
        sel = [v for v, _ in nll[:m]]
        out[i] = (len(s.split(" ")), m, round(sum(sel) / m, 6))
    return out


def test_hand_recomputation_and_ranks(spark):
    docs = [
        (1, "a a b c d e f g h i"),
        (2, "a a a a a a a a a a"),
        (3, "a b a b a b a b x y"),
    ]
    rows = mink_prob_membership(_df(spark, docs), top_n=3).collect()
    hand = _hand(docs)
    got = {r.doc_id: (r.n_tokens, r.k_tokens, r.mink_mean_nll) for r in rows}
    assert got == hand
    # doc 2 (pure boilerplate) must rank most member-like
    assert rows[0].doc_id == 2 and rows[0].rank == 1


def test_tail_not_mean_drives_the_score(spark):
    """Two docs with similar overall composition; one hides a single
    very rare token — its bottom-k% tail blows up even though the
    whole-doc mean barely moves."""
    common = "the of and to in " * 8  # 40 common tokens
    docs = [
        (1, (common + "the of and to").strip()),
        (2, (common + "the of and zzquux").strip()),
    ]
    rows = mink_prob_membership(_df(spark, docs), top_n=2).collect()
    assert rows[0].doc_id == 1
    assert rows[1].doc_id == 2
    assert rows[1].mink_mean_nll > rows[0].mink_mean_nll + 0.2


def test_k_ceil_edges(spark):
    # 4 tokens at k=0.2 -> ceil(0.8) = 1 tail token; 5 tokens -> 1;
    # 6 tokens -> ceil(1.2) = 2
    docs = [(1, "a b c d"), (2, "a b c d e"), (3, "a b c d e f")]
    rows = mink_prob_membership(_df(spark, docs), top_n=3).collect()
    got = {r.doc_id: r.k_tokens for r in rows}
    assert got == {1: 1, 2: 1, 3: 2}


def test_sql_twin_matches_spark_exactly(spark):
    docs = [
        (i, " ".join(f"w{(i * j) % 13}" for j in range(1, 15)))
        for i in range(1, 9)
    ]
    r = mink_prob_membership(_df(spark, docs), top_n=5).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    rows = con.execute(mink_prob_membership_sql(top_n=5)).fetchall()
    assert rows == [
        (x.rank, x.doc_id, x.n_tokens, x.k_tokens, x.mink_mean_nll)
        for x in r
    ]
