"""Wave 135 — Burrows' Delta stylometric distance.

Hand-pinned tests for operators/text.py burrows_delta: the Delta
recomputed by hand on a 3-source fixture, the style-contrast property
(a source with divergent function-word usage is farther from both
others than they are from each other), zero-count words entering the
grid explicitly, symmetry of the pair listing, and SQL-twin equality.
Spec: burrows_delta_sources (plans/text_analytics.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import statistics

import duckdb
import pytest

from mcas_question2_etl_spark.operators.text import (
    burrows_delta,
    burrows_delta_sql,
)

# three "authors": s1/s2 share style (the-heavy), s3 is of-heavy
S1 = "the cat the dog the bird of prey"
S2 = "the sun the moon the star of dawn"
S3 = "of gold of silver of bronze the coin"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


FIX = [(0, "s1", S1), (1, "s2", S2), (2, "s3", S3)]


def _hand_delta(rows, top_k):
    from collections import Counter, defaultdict

    cnt = defaultdict(Counter)
    tot = Counter()
    allw = Counter()
    for _, s, t in rows:
        for w in t.split(" "):
            if w:
                cnt[s][w] += 1
                tot[s] += 1
                allw[w] += 1
    words = sorted(allw, key=lambda w: (-allw[w], w))[:top_k]
    srcs = sorted(cnt)
    z = {}
    for w in words:
        fs = [cnt[s][w] / tot[s] for s in srcs]
        mu = sum(fs) / len(fs)
        sd = statistics.stdev(fs)
        z[w] = {s: (cnt[s][w] / tot[s] - mu) / sd for s in srcs}
    out = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            out[(a, b)] = sum(abs(z[w][a] - z[w][b]) for w in words) / len(
                words
            )
    return out


def test_delta_recomputed_by_hand(spark):
    out = {
        (r.source_a, r.source_b): r
        for r in burrows_delta(_df(spark, FIX), top_k=5).collect()
    }
    hand = _hand_delta(FIX, 5)
    assert set(out) == set(hand)
    for k, v in hand.items():
        assert out[k].n_words == 5
        assert out[k].delta == pytest.approx(round(v, 6), abs=1e-9)


def test_style_contrast(spark):
    out = {
        (r.source_a, r.source_b): r.delta
        for r in burrows_delta(_df(spark, FIX), top_k=5).collect()
    }
    assert out[("s1", "s2")] < out[("s1", "s3")]
    assert out[("s1", "s2")] < out[("s2", "s3")]


def test_zero_count_words_in_grid(spark):
    """A top word absent from one source must still contribute (with
    f = 0), not silently drop the pair's word count."""
    rows = [(0, "a", "x x x y"), (1, "b", "x x z z")]
    out = burrows_delta(_df(spark, rows), top_k=3).collect()
    assert out[0].n_words == 3  # x, y (absent in b), z (absent in a)


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (i, f"s{i % 4}", " ".join("wabcde"[(i + j * j) % 6] for j in range(30)))
        for i in range(24)
    ]
    s = [tuple(r) for r in burrows_delta(_df(spark, rows), top_k=6).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    d = con.execute(burrows_delta_sql(top_k=6)).fetchall()
    assert s == d
