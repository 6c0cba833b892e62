"""Wave 139 — newsvendor critical-fractile stock + EOQ.

Hand-pinned tests for operators/econ.py newsvendor_stock: the order
statistic picked by the critical fractile recomputed by hand, fractile
monotonicity (higher underage cost -> higher stock), the EOQ closed
form, top-k ordering, and SQL-twin equality. Spec:
newsvendor_part_stock (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.econ import (
    newsvendor_stock,
    newsvendor_stock_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "item long, qty long")


def test_order_statistic_by_hand(spark):
    """Item 1 demands sorted: [2,3,5,7,11,13,17,19]; cf = 3/4 ->
    k = ceil(0.75*9) = 7 -> stock = 17."""
    q = [7, 2, 13, 5, 3, 19, 11, 17]
    rows = [(1, v) for v in q]
    r = newsvendor_stock(_df(spark, rows), "item", "qty").collect()[0]
    assert r.n_periods == 8
    assert r.stock_level == 17
    assert r.total_demand == sum(q)
    dbar = sum(q) / 8
    assert r.eoq == pytest.approx(
        round(math.sqrt(2 * dbar * 50.0 / 0.25), 6), abs=1e-9
    )


def test_fractile_monotone_in_underage_cost(spark):
    q = [(1, v) for v in (2, 3, 5, 7, 11, 13, 17, 19)]
    lo = newsvendor_stock(
        _df(spark, q), "item", "qty", underage=1.0, overage=3.0
    ).collect()[0]
    hi = newsvendor_stock(
        _df(spark, q), "item", "qty", underage=9.0, overage=1.0
    ).collect()[0]
    # cf 0.25 -> k = ceil(0.25*9) = 3 -> 5 ; cf 0.9 -> k = ceil(8.1) = 8 -> 19
    assert lo.stock_level == 5
    assert hi.stock_level == 19


def test_topk_by_total_demand(spark):
    rows = [(1, 5), (1, 5), (2, 100), (2, 1), (3, 30), (3, 30)]
    out = newsvendor_stock(_df(spark, rows), "item", "qty", top_k=2).collect()
    assert [r.item for r in out] == [2, 3]  # totals 101, 60 beat 10


def test_sql_twin_matches_spark_exactly(spark):
    rows = [(k, 1 + (k * 7 + j * j) % 23) for k in range(8) for j in range(9)]
    s = [tuple(r) for r in newsvendor_stock(_df(spark, rows), "item", "qty").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (item BIGINT, qty BIGINT)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    d = con.execute(
        newsvendor_stock_sql("SELECT * FROM t0", "item", "qty")
    ).fetchall()
    assert s == d
