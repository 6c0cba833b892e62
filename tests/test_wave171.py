"""Wave 171 — column encoding advisor.

Hand-pinned byte accounting on a tiny fixture (plain/dict/RLE sizes
recomputed to the byte), the ordering property RLE exists for (the
SAME values advise 'rle' in sorted order and not in shuffled order),
recommendation tie-breaks, and SQL-twin equality. Spec:
encoding_advisor_lineitem (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.profiling import (
    encoding_advisor,
    encoding_advisor_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "ord long, a string, b string")


def _hand_col(vals):
    n = len(vals)
    widths = [len(v) + 4 for v in vals]
    plain = sum(widths)
    dvals = {}
    for v, w in zip(vals, widths):
        dvals[v] = w
    ndv = len(dvals)
    bits = math.ceil(math.log2(max(ndv, 2)))
    dictb = sum(dvals.values()) + (n * bits + 7) // 8
    runs = 1 + sum(1 for i in range(1, n) if vals[i] != vals[i - 1])
    rleb = runs * 4 + (runs * plain) // n
    best = (
        "dict"
        if dictb <= plain and dictb <= rleb
        else ("rle" if rleb <= plain else "plain")
    )
    return (
        n, ndv, plain, dictb, runs, rleb, best,
        round(min(dictb, rleb, plain) / plain, 6),
    )


def test_hand_recomputation(spark):
    a_vals = ["red", "red", "blue", "blue", "blue", "red", "green", "red"]
    b_vals = [f"u{i:03d}" for i in range(8)]
    rows = [(i, a_vals[i], b_vals[i]) for i in range(8)]
    got = {
        r.column: (
            r.n, r.ndv, r.plain_bytes, r.dict_bytes, r.rle_runs,
            r.rle_bytes, r.best, r.best_ratio,
        )
        for r in encoding_advisor(_df(spark, rows), "ord", ["a", "b"]).collect()
    }
    assert got["a"] == _hand_col(a_vals)
    assert got["b"] == _hand_col(b_vals)


def test_rle_is_an_ordering_property(spark):
    vals = (["x"] * 40 + ["y"] * 40 + ["z"] * 40)
    sorted_rows = [(i, v, "pad") for i, v in enumerate(vals)]
    shuffled = [vals[(i * 41) % 120] for i in range(120)]
    shuffled_rows = [(i, v, "pad") for i, v in enumerate(shuffled)]
    r_sorted = {
        r.column: r
        for r in encoding_advisor(
            _df(spark, sorted_rows), "ord", ["a"]
        ).collect()
    }["a"]
    r_shuf = {
        r.column: r
        for r in encoding_advisor(
            _df(spark, shuffled_rows), "ord", ["a"]
        ).collect()
    }["a"]
    assert r_sorted.rle_runs == 3
    assert r_shuf.rle_runs > 30
    assert r_sorted.best == "rle"
    assert r_sorted.rle_bytes < r_shuf.rle_bytes


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (i, "abcde"[(i * 3) % 5] * ((i % 3) + 1), f"v{(i * 7) % 11}")
        for i in range(60)
    ]
    r = encoding_advisor(_df(spark, rows), "ord", ["a", "b"]).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (ord BIGINT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", rows)
    got = con.execute(
        encoding_advisor_sql("t0", "ord", ["a", "b"])
    ).fetchall()
    assert got == [
        (x.column, x.n, x.ndv, x.plain_bytes, x.dict_bytes,
         x.rle_runs, x.rle_bytes, x.best, x.best_ratio)
        for x in r
    ]
