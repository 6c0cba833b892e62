"""Wave 175 — golden-record survivorship consolidation.

Hand-built cluster fixtures pinning each rule (last-write-wins under
the (recency, tiebreak) total order including the recency tie;
deterministic mode under (count desc, value asc) including the count
tie; max), lineage counts, and SQL-twin equality. Spec:
golden_record_customers (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.profiling import (
    golden_record,
    golden_record_sql,
)

_SCHEMA = "cl long, r long, k long, p string, clerk string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


_ROWS = [
    # cluster 1: recency tie at r=5 broken by k (k=12 wins: p='late')
    (1, 3, 10, "old", "amy", 10.0),
    (1, 5, 11, "mid", "bob", 30.0),
    (1, 5, 12, "late", "bob", 20.0),
    # cluster 2: mode tie amy=2 vs bob=2 -> 'amy' (value asc)
    (2, 1, 20, "a", "amy", 5.0),
    (2, 2, 21, "b", "bob", 6.0),
    (2, 3, 22, "c", "amy", 7.0),
    (2, 4, 23, "d", "bob", 8.0),
]


def test_rules_pinned(spark):
    out = {
        r.cluster: r
        for r in golden_record(
            _df(spark, _ROWS), "cl", "r", "k", ["p"], ["clerk"], ["v"]
        ).collect()
    }
    c1, c2 = out[1], out[2]
    assert c1.p == "late"          # recency tie broken by tiebreak
    assert c1.clerk == "bob"       # bob 2 vs amy 1
    assert c1.v == 30.0
    assert (c1.n_records, c1.clerk_ndv) == (3, 2)
    assert c2.p == "d"             # plain last write
    assert c2.clerk == "amy"       # count tie -> value asc
    assert c2.clerk_ndv == 2


def test_sql_twin_matches_spark_exactly(spark):
    rows = list(_ROWS)
    for i in range(60):
        rows.append(
            (3 + i % 4, (i * 7) % 9, 100 + i,
             "pqrs"[(i * 3) % 4], "c" + str((i * 5) % 3), float(i))
        )
    r = golden_record(
        _df(spark, rows), "cl", "r", "k", ["p"], ["clerk"], ["v"]
    ).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t0 (cl BIGINT, r BIGINT, k BIGINT, p VARCHAR,"
        " clerk VARCHAR, v DOUBLE)"
    )
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?, ?, ?, ?)", rows)
    got = con.execute(
        golden_record_sql(
            "SELECT * FROM t0", "cl", "r", "k", ["p"], ["clerk"], ["v"]
        )
    ).fetchall()
    want = [
        (x.cluster, x.n_records, x.p, x.v, x.clerk, x.clerk_ndv)
        for x in r
    ]
    assert got == want
