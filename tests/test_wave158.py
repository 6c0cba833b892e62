"""Wave 158 — k-truss peeling profile.

Hand-built fixtures with known truss structure: a clique K4 (every
edge in 2 triangles — survives 4-truss peeling forever), a triangle
with a pendant edge (pendant peels in round 1, triangle in round 2 at
k=4 since each edge's single triangle dies with nothing... actually a
lone triangle has support 1 < 2 so peels immediately), convergence
rows, and SQL-twin equality. Spec: ktruss_copurchase_profile
(plans/graph_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.graph_metrics import (
    ktruss_peel_profile,
    ktruss_peel_profile_sql,
)


def _df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "a long, b long"
    )


_K4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]


def test_k4_is_a_4_truss_fixpoint(spark):
    rows = ktruss_peel_profile(_df(spark, _K4), k=4, rounds=3).collect()
    assert [(r.round, r.n_edges, r.n_removed) for r in rows] == [
        (1, 6, 0), (2, 6, 0), (3, 6, 0)
    ]


def test_pendant_and_lone_triangle_peel(spark):
    # K4 + lone triangle (10,11,12) + pendant edge (1,99)
    edges = _K4 + [(10, 11), (10, 12), (11, 12), (1, 99)]
    rows = ktruss_peel_profile(_df(spark, edges), k=4, rounds=3).collect()
    # round 1: 10 edges in; lone-triangle edges have support 1 < 2 and
    # the pendant has 0 -> 4 removed; round 2: K4 alone, stable.
    assert [(r.round, r.n_edges, r.n_removed) for r in rows] == [
        (1, 10, 4), (2, 6, 0), (3, 6, 0)
    ]


def test_cascading_peel(spark):
    """Two triangles sharing an edge: every edge has support >= 1 but
    only the shared edge has 2 — at k=4 the outer edges peel in round
    1, which strands the shared edge for round 2: a genuine cascade."""
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    rows = ktruss_peel_profile(_df(spark, edges), k=4, rounds=3).collect()
    assert [(r.round, r.n_edges, r.n_removed) for r in rows] == [
        (1, 5, 4), (2, 1, 1), (3, 0, 0)
    ]


def test_sql_twin_matches_spark_exactly(spark):
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 7) % 23, (i * 11 + 3) % 23) for i in range(60)
            )
            if a != b
        }
    )
    r = ktruss_peel_profile(_df(spark, edges), k=4, rounds=5).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE te (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO te VALUES (?, ?)", edges)
    rows = con.execute(
        ktruss_peel_profile_sql("SELECT a, b FROM te", k=4, rounds=5)
    ).fetchall()
    assert rows == [(x.round, x.n_edges, x.n_removed) for x in r]
