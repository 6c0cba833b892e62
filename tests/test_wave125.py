"""Wave 125 — item-item cosine CF (binary co-occurrence).

Hand-pinned tests for operators/recommend.py item_cosine_topk: exact
cosine recomputation on a small basket fixture, min-support filtering,
duplicate-line idempotence (binary semantics), top-k total order, and
SQL-twin equality. Spec: item_cosine_copurchase
(plans/ops_bi_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.recommend import (
    item_cosine_topk,
    item_cosine_topk_sql,
)

# baskets: items 1,2 co-occur 3x; 1,3 co-occur 2x; 2,3 once; 4 alone
BASKETS = [
    (10, 1), (10, 2), (10, 3),
    (11, 1), (11, 2),
    (12, 1), (12, 2),
    (13, 1), (13, 3),
    (14, 4),
    (15, 2),
]


def _df(spark, rows=BASKETS):
    return spark.createDataFrame(rows, "b long, i long")


def test_cosine_recomputed_by_hand(spark):
    out = {
        (r.item_i, r.item_j): r
        for r in item_cosine_topk(_df(spark), "b", "i", min_support=1).collect()
    }
    n = {1: 4, 2: 4, 3: 2, 4: 1}
    c = {(1, 2): 3, (1, 3): 2, (2, 3): 1}
    for (i, j), cij in c.items():
        r = out[(i, j)]
        assert (r.n_i, r.n_j, r.c_ij) == (n[i], n[j], cij)
        assert r.cosine == pytest.approx(
            round(cij / math.sqrt(n[i] * n[j]), 6), abs=1e-9
        )
    assert not any(4 in k for k in out)  # item 4 never co-occurs


def test_min_support_filters(spark):
    out = item_cosine_topk(_df(spark), "b", "i", min_support=2).collect()
    pairs = {(r.item_i, r.item_j) for r in out}
    assert pairs == {(1, 2), (1, 3)}  # the c=1 pair (2,3) dropped


def test_binary_semantics_duplicate_lines_ignored(spark):
    doubled = BASKETS + BASKETS  # same baskets repeated
    a = item_cosine_topk(_df(spark), "b", "i", min_support=1).collect()
    b = item_cosine_topk(_df(spark, doubled), "b", "i", min_support=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_topk_order_is_total(spark):
    out = item_cosine_topk(_df(spark), "b", "i", min_support=1).collect()
    keys = [(-r.cosine, r.item_i, r.item_j) for r in out]
    assert keys == sorted(keys)
    # strongest pair first: (1,2) with 3/sqrt(16)
    assert (out[0].item_i, out[0].item_j) == (1, 2)


def test_sql_twin_matches_spark_exactly(spark):
    rows = [(b * 3 + k, (b * 7 + k * k) % 9) for b in range(40) for k in range(3)]
    s = [
        tuple(r)
        for r in item_cosine_topk(
            _df(spark, rows), "b", "i", top_k=15, min_support=1
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (b BIGINT, i BIGINT)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    d = con.execute(
        item_cosine_topk_sql(
            "SELECT * FROM t0", "b", "i", top_k=15, min_support=1
        )
    ).fetchall()
    assert s == d
