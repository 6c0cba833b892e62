"""Wave-80 hand pins: link-prediction battery, Katz walk counts,
partition modularity — expected values recomputed independently
in-test on a 5-node fixture graph.

Covered spec names: link_prediction_scores, katz_centrality_walks,
brand_modularity_copurchase.
"""

from __future__ import annotations

import math

import pytest

from mcas_question2_etl_spark.operators import graph_metrics

#    1 - 2
#     \  |
#       3 - 4 - 5      (triangle 1-2-3, tail 3-4-5)
EDGES = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
NBRS = {1: {2, 3}, 2: {1, 3}, 3: {1, 2, 4}, 4: {3, 5}, 5: {4}}
DEG = {n: len(v) for n, v in NBRS.items()}


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "a long, b long")


def test_link_prediction_pin(spark):
    """Non-adjacent pairs with common neighbors: (1,4),(2,4) via 3.
    RA/Jaccard/PA recomputed by hand."""
    out = {
        (r.u, r.v): r
        for r in graph_metrics.link_prediction_scores(
            _edges_df(spark), top_n=20
        ).collect()
    }
    exp = {}
    for u in NBRS:
        for v in NBRS:
            if u >= v or v in NBRS[u]:
                continue
            common = NBRS[u] & NBRS[v]
            if not common:
                continue
            ra = sum(1.0 / DEG[w] for w in common)
            jac = len(common) / (DEG[u] + DEG[v] - len(common))
            exp[(u, v)] = (len(common), ra, jac, DEG[u] * DEG[v])
    assert set(out) == set(exp)
    for k, (cn, ra, jac, pa) in exp.items():
        r = out[k]
        assert r.common_neighbors == cn
        assert r.ra_score == pytest.approx(round(ra, 6), abs=1e-9)
        assert r.jaccard == pytest.approx(round(jac, 6), abs=1e-9)
        assert r.pref_attach == pa


def test_katz_walks_pin(spark):
    """Walk counts via repeated neighbor sums; katz at alpha=0.05."""
    w1 = dict(DEG)
    w2 = {v: sum(w1[u] for u in NBRS[v]) for v in NBRS}
    w3 = {v: sum(w2[u] for u in NBRS[v]) for v in NBRS}
    out = {
        r.node: r
        for r in graph_metrics.katz_walks(_edges_df(spark), top_n=20).collect()
    }
    assert set(out) == set(NBRS)
    for v in NBRS:
        r = out[v]
        assert (r.walks1, r.walks2, r.walks3) == (w1[v], w2[v], w3[v])
        assert r.katz == pytest.approx(
            round(0.05 * w1[v] + 0.0025 * w2[v] + 0.000125 * w3[v], 6),
            abs=1e-9,
        )
    # node 3 (the hub) must rank first
    top = graph_metrics.katz_walks(_edges_df(spark), top_n=1).collect()[0]
    assert top.node == 3


def test_partition_modularity_pin(spark):
    """Split {1,2,3} vs {4,5}: m=5, intra=(3,1), degree sums (7,3);
    q_c = e_c/m - (d_c/2m)^2 = 0.11 for both."""
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B")],
        "node long, community string",
    )
    out = {
        r.community: r
        for r in graph_metrics.partition_modularity(
            _edges_df(spark), labels
        ).collect()
    }
    a, b = out["A"], out["B"]
    assert (a.n_nodes, a.intra_edges, a.degree_sum) == (3, 3, 7)
    assert (b.n_nodes, b.intra_edges, b.degree_sum) == (2, 1, 3)
    assert a.q_contrib == pytest.approx(3 / 5 - (7 / 10) ** 2, abs=1e-9)
    assert b.q_contrib == pytest.approx(1 / 5 - (3 / 10) ** 2, abs=1e-9)


def test_partition_modularity_no_intra(spark):
    """A community with zero intra edges must report 0, not NULL."""
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "A"), (5, "B")],
        "node long, community string",
    )
    out = {
        r.community: r
        for r in graph_metrics.partition_modularity(
            _edges_df(spark), labels
        ).collect()
    }
    # B = {3, 5}: edges (3,4),(4,5) cross, none intra
    assert out["B"].intra_edges == 0
    assert out["B"].q_contrib == pytest.approx(
        0.0 - (4 / 10) ** 2, abs=1e-9
    )
