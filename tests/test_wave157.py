"""Wave 157 — DDSketch relative-error quantiles.

The published guarantee pinned directly (every estimate within alpha
relative error of the EXACT quantile on a log-spread fixture), bucket
mergeability-by-addition, the positive-store contract, and SQL-twin
exact equality. Spec: ddsketch_price_quantiles
(plans/extensions.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.sketches import (
    ddsketch_quantiles,
    ddsketch_quantiles_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def _exact_quantile(vals, q):
    s = sorted(vals)
    return s[math.ceil(q * (len(s) - 1) + 1) - 1]


def test_relative_error_guarantee(spark):
    """Log-spread values over 4 decades: each DDSketch estimate must
    sit within alpha = 1% RELATIVE error of the exact quantile — the
    guarantee KLL cannot make for extreme tails."""
    vals = [1.5 ** (i % 40) * (1 + (i % 7) * 0.01) for i in range(400)]
    rows = [("a", float(v)) for v in vals]
    out = ddsketch_quantiles(
        _df(spark, rows), "g", "v", qs=(0.5, 0.9, 0.99), rel_err=0.01
    ).collect()
    assert len(out) == 3
    for r in out:
        exact = _exact_quantile(vals, r.q)
        assert abs(r.estimate - exact) / exact <= 0.0101, (r.q, exact)


def test_positive_store_contract_and_counts(spark):
    rows = [("a", 1.0), ("a", 10.0), ("a", -5.0), ("a", 0.0), ("a", 100.0)]
    out = ddsketch_quantiles(_df(spark, rows), "g", "v", qs=(0.5,)).collect()
    assert out[0].n == 3  # zero and negative excluded by contract


def test_merge_by_addition(spark):
    """Sketching two halves separately and adding bucket counts must
    equal sketching the whole — verified through the estimate, which
    depends only on the (bucket, count) table."""
    vals = [2.0 ** (i % 20) for i in range(200)]
    whole = [("a", float(v)) for v in vals]
    halves = [("a", float(v)) for v in vals[:100]] + [
        ("a", float(v)) for v in vals[100:]
    ]
    r1 = ddsketch_quantiles(_df(spark, whole), "g", "v").collect()
    r2 = ddsketch_quantiles(_df(spark, halves), "g", "v").collect()
    assert [(r.q, r.bucket, r.estimate) for r in r1] == [
        (r.q, r.bucket, r.estimate) for r in r2
    ]


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        ("a" if i % 3 else "b", ((i * 17) % 97) + 0.25 + (i % 5))
        for i in range(300)
    ]
    r = ddsketch_quantiles(_df(spark, rows), "g", "v").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    got = con.execute(
        ddsketch_quantiles_sql("SELECT * FROM t0", "g", "v")
    ).fetchall()
    assert got == [(x.g, x.q, x.n, x.bucket, x.estimate) for x in r]
