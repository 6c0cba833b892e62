"""Wave 121 — winnowing document fingerprints (MOSS).

Hand-pinned unit tests for operators/text.py winnow_fingerprints:
the paper's guarantees (shared-substring detection, density), the
rightmost-tie packing trick, short-document guards, and exact
Spark-vs-DuckDB equality on adversarial fixtures. Spec:
winnow_fingerprints_sources (plans/text_analytics.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.text import (
    _WINNOW_POS_LIMIT,
    winnow_fingerprints,
    winnow_fingerprints_sql,
)

K, W = 4, 4


def _spark_rows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in winnow_fingerprints(df).collect()}


def _duck_rows(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    cur = con.execute(winnow_fingerprints_sql("SELECT * FROM t0"))
    cols = [d[0] for d in cur.description]
    return {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}


FIXTURES = [
    (1, "the quick brown fox jumps over the lazy dog and then some"),
    (2, "a b c"),  # fewer tokens than k -> no grams
    (3, "a b c d e f"),  # grams but fewer than window -> no fps
    (4, "x " * 40 + "tail"),  # all-equal hashes: tie rule everywhere
    (5, ""),
    (6, "  MIXED   Case\t and   spacing  normalize the same way  ok " * 3),
]


def test_cross_engine_exact(spark):
    s = _spark_rows(spark, FIXTURES)
    d = _duck_rows(FIXTURES)
    assert set(s) == set(d)
    for k in s:
        for c in ("n_grams", "n_fps", "fp_checksum", "density"):
            assert s[k][c] == d[k][c], (k, c, s[k], d[k])


def test_short_document_guards(spark):
    out = _spark_rows(spark, FIXTURES)
    assert out[2]["n_grams"] == 0 and out[2]["n_fps"] == 0
    assert out[3]["n_grams"] == 3 and out[3]["n_fps"] == 0
    assert out[5]["n_fps"] == 0 and out[5]["fp_checksum"] == 0


def test_density_near_paper_expectation(spark):
    """Expected winnowing density is 2/(w+1) = 0.4 for random hashes."""
    long_doc = " ".join(f"tok{i * 7919 % 5003}" for i in range(400))
    out = _spark_rows(spark, [(1, long_doc)])
    assert out[1]["density"] == pytest.approx(2 / (W + 1), abs=0.08)


def test_shared_run_yields_shared_fingerprint(spark):
    """The paper's guarantee: a shared token run of length >= k+w-1
    (here 7) must contribute at least one identical (hash, pos-packed)
    selection — positions differ, so compare the HASH part of the
    packed fingerprints."""
    shared = "alpha beta gamma delta epsilon zeta eta"
    a = "xq1 wz2 " + shared + " pr9"
    b = "completely different prefix tokens here " + shared
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    from mcas_question2_etl_spark.operators.text import (
        winnow_fingerprint_cols,
    )

    staged = df
    for name, c in winnow_fingerprint_cols("text", k=K, window=W).items():
        staged = staged.withColumn(name, c)
    fps = {
        r["doc_id"]: {v // _WINNOW_POS_LIMIT for v in r["__winnow_fps"]}
        for r in staged.select("doc_id", "__winnow_fps").collect()
    }
    assert fps[1] & fps[2], "no shared fingerprint from a k+w-1 shared run"


def test_tie_rule_prefers_rightmost(spark):
    """All-identical grams ('x x x ... x') hash equal, so every window
    min is decided by the packed position term: rightmost wins, and the
    selected positions step once per window slide."""
    n = 20
    doc = " ".join(["x"] * n)
    from mcas_question2_etl_spark.operators.text import (
        winnow_fingerprint_cols,
    )

    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    staged = df
    for name, c in winnow_fingerprint_cols("text", k=K, window=W).items():
        staged = staged.withColumn(name, c)
    packed = staged.select("__winnow_fps").collect()[0][0]
    pos = sorted(_WINNOW_POS_LIMIT - 1 - v % _WINNOW_POS_LIMIT for v in packed)
    m = n - K + 1  # 17 grams
    # every window [s, s+3] selects its rightmost gram s+3
    assert pos == list(range(W - 1, m))
