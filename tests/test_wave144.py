"""Wave 144 — skyline (Pareto-front) query operator.

Hand-pinned tests for operators/skyline.py: the dominance semantics on
a tiny planted frontier (dominated rows removed, incomparable rows
kept), equal-rows behavior (neither dominates — both stay), exact
rational comparison via cross-multiplication (a case where float
division of the same rationals would tie incorrectly), and SQL-twin
equality. Spec: skyline_suppliers (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.skyline import skyline, skyline_sql


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k long, a bigint, da bigint, b bigint, db bigint"
    )


CRIT = [("a", "da"), ("b", "db")]


def test_planted_frontier(spark):
    rows = [
        (1, 1, 1, 9, 1),   # frontier (best a)
        (2, 5, 1, 5, 1),   # frontier (middle)
        (3, 9, 1, 1, 1),   # frontier (best b)
        (4, 6, 1, 6, 1),   # dominated by 2
        (5, 9, 1, 9, 1),   # dominated by everyone
    ]
    out = [r.k for r in skyline(_df(spark, rows), "k", CRIT).collect()]
    assert out == [1, 2, 3]


def test_duplicate_rows_both_survive(spark):
    """Equal on every criterion: neither strictly beats the other, so
    both are in the skyline (the standard definition)."""
    rows = [(1, 4, 1, 4, 1), (2, 4, 1, 4, 1), (3, 9, 1, 9, 1)]
    out = [r.k for r in skyline(_df(spark, rows), "k", CRIT).collect()]
    assert out == [1, 2]


def test_rational_cross_multiplication_exactness(spark):
    """1/3 vs 333333/1000000: the float quotients agree to 15 digits
    BUT 1/3 is strictly larger — the integer cross-product must see
    it. Row 2 therefore dominates row 1 on 'a' (smaller) and ties are
    broken by its strictly better 'b'."""
    rows = [
        (1, 1, 3, 5, 1),             # a = 1/3
        (2, 333333, 1000000, 4, 1),  # a = 0.333333 < 1/3, b better
    ]
    out = [r.k for r in skyline(_df(spark, rows), "k", CRIT).collect()]
    assert out == [2]


def test_single_row_is_its_own_skyline(spark):
    rows = [(7, 5, 2, 3, 1)]
    out = skyline(_df(spark, rows), "k", CRIT).collect()
    assert [r.k for r in out] == [7]


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (i, (i * 7) % 23, 1 + i % 3, (i * 13) % 19, 1 + (i * 5) % 4)
        for i in range(40)
    ]
    s = [tuple(r) for r in skyline(_df(spark, rows), "k", CRIT).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t0 (k BIGINT, a BIGINT, da BIGINT, b BIGINT, db BIGINT)"
    )
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?, ?, ?)", rows)
    d = con.execute(
        skyline_sql("SELECT * FROM t0", "k", CRIT)
    ).fetchall()
    assert s == d
