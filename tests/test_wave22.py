"""Unit tests for wave-22: transitive closure vs python replay,
cycle guard, grouping-sets accounting."""

from __future__ import annotations

import random

import pytest


def _py_closure(edges):
    parents = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
    out = {}
    for start in parents:
        frontier = {(p, 1) for p in parents[start]}
        seen = {}
        while frontier:
            nxt = set()
            for node, d in frontier:
                if node not in seen or seen[node] > d:
                    seen[node] = d
                    for p in parents.get(node, ()):
                        nxt.add((p, d + 1))
            frontier = nxt
        for anc, d in seen.items():
            out[(anc, start)] = d
    return out


def test_transitive_closure_matches_python_on_dag(spark):
    """Random multi-path DAG (edges only point to smaller ids, so it's
    acyclic): closure equals a pure-Python BFS with min depth."""
    from mcas_question2_etl_spark.operators.closure import transitive_closure

    rng = random.Random(13)
    edges = set()
    for c in range(1, 60):
        for _ in range(rng.randrange(1, 3)):  # 1-2 parents -> multi-path
            edges.add((c, rng.randrange(0, c)))
    edf = spark.createDataFrame(sorted(edges), "child long, parent long")
    got = {
        (r.ancestor, r.descendant): r.depth
        for r in transitive_closure(edf).collect()
    }
    assert got == _py_closure(edges)


def test_transitive_closure_raises_on_cycle(spark):
    from mcas_question2_etl_spark.operators.closure import transitive_closure

    edf = spark.createDataFrame([(1, 2), (2, 1)], "child long, parent long")
    with pytest.raises(RuntimeError):
        transitive_closure(edf, max_depth=5)


def test_grouping_sets_grains_account(spark):
    """Grand-total grain equals the table count; per-flag subtotals sum
    to the grand total; grp_id distinguishes the three grains."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.graph_specs import grouping_sets_report
    from tests.conftest import SF_SMALL

    rows = grouping_sets_report(spark, SF_SMALL).collect()
    total = load_table(spark, SF_SMALL, "lineitem").count()
    grand = [r for r in rows if r.grp_id == 3]
    assert len(grand) == 1 and grand[0].n_rows == total
    flag_rows = [r for r in rows if r.grp_id == 1]
    assert sum(r.n_rows for r in flag_rows) == total
    detail = [r for r in rows if r.grp_id == 0]
    assert sum(r.n_rows for r in detail) == total
