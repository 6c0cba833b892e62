"""Wave 130 — term burstiness / adaptation (Church-Gale, Katz).

Hand-pinned tests for operators/text.py term_burstiness: df1/df2/cf
recomputed on a tiny corpus, the bursty-vs-scattered contrast (same
collection frequency, different clumping), the zero-truncated-Poisson
baseline for burstiness, min_df filtering, and SQL-twin equality.
Spec: term_burstiness_docs (plans/text_analytics.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.text import (
    term_burstiness,
    term_burstiness_sql,
)

# 6 docs: 'bursty' appears 3x in each of 2 docs (cf=6, df1=2, df2=2);
# 'flat' appears once in each of 6 docs (cf=6, df1=6, df2=0)
DOCS = [
    (0, "bursty bursty bursty pad flat"),
    (1, "bursty bursty bursty pad flat"),
    (2, "pad pad flat x"),
    (3, "pad flat y"),
    (4, "flat pad z"),
    (5, "flat pad w"),
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_and_adaptation_by_hand(spark):
    out = {
        r.term: r
        for r in term_burstiness(_df(spark), min_df=2, top_k=50).collect()
    }
    b = out["bursty"]
    assert (b.cf, b.df1, b.df2) == (6, 2, 2)
    assert b.adaptation == 1.0
    f = out["flat"]
    assert (f.cf, f.df1, f.df2) == (6, 6, 0)
    assert f.adaptation == 0.0


def test_burstiness_ztp_baseline_by_hand(spark):
    out = {
        r.term: r
        for r in term_burstiness(_df(spark), min_df=2, top_k=50).collect()
    }
    lam = 6 / 6  # cf / n_docs
    ztp = lam / (1 - math.exp(-lam))
    assert out["bursty"].burstiness == pytest.approx(
        round((6 / 2) / ztp, 6), abs=1e-9
    )
    assert out["flat"].burstiness == pytest.approx(
        round((6 / 6) / ztp, 6), abs=1e-9
    )
    # same cf, wildly different clumping
    assert out["bursty"].burstiness > 2.5 * out["flat"].burstiness


def test_min_df_filters(spark):
    out = {r.term for r in term_burstiness(_df(spark), min_df=5, top_k=50).collect()}
    assert "bursty" not in out  # df1 = 2 < 5
    assert "flat" in out and "pad" in out


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (i, " ".join("abcde"[(i * 3 + j * j) % 5] for j in range(12)))
        for i in range(30)
    ]
    s = [
        tuple(r)
        for r in term_burstiness(_df(spark, rows), min_df=3, top_k=10).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    d = con.execute(
        term_burstiness_sql("docs", min_df=3, top_k=10)
    ).fetchall()
    assert s == d
