"""r9 optimization: two-phase connected components (partition-local
union-find contraction + rep-graph rounds) behind method="auto".

The rewrite changes HOW labels are computed, not what they are: these
tests pin the output against the iterative hashmin core and a chain
whose edges are deliberately scattered across many partitions so the
contraction CANNOT finish locally (non-empty rep graph — the path that
exercises the cross-partition merge and the composition join).
"""

from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.clustering import (
    _local_contract,
    connected_components,
)


def test_two_phase_scattered_chain_matches_hashmin(spark):
    # one long chain + a triangle + singletons, scattered over 16
    # partitions so per-partition union-find sees disjoint fragments
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)] + [(20, 21), (21, 22), (20, 22)],
        ["a_id", "b_id"],
    ).repartition(16)
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(1, 13)) + [20, 21, 22, 30]], ["doc_id"]
    )
    auto = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, nodes).collect()
    }
    hm = {
        r.doc_id: r.cluster_id
        for r in connected_components(
            edges, nodes, method="hashmin", max_iter=25
        ).collect()
    }
    assert auto == hm
    assert auto[12] == 1 and auto[22] == 20 and auto[30] == 30


def test_two_phase_empty_edges_all_singletons(spark):
    edges = spark.createDataFrame([], "a_id long, b_id long")
    nodes = spark.createDataFrame([(i,) for i in (3, 5, 8)], ["doc_id"])
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(edges, nodes).collect()
    }
    assert got == {3: 3, 5: 5, 8: 8}


def test_local_contract_kernel_min_labels(spark):
    # single partition -> the numpy kernel must resolve the whole
    # component: chain 1-2-3-4 written in mixed directions + self-loop
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (7, 7)], ["a_id", "b_id"]
    ).coalesce(1)
    e = edges.select(
        F.col("a_id").cast("long").alias("src"),
        F.col("b_id").cast("long").alias("dst"),
    )
    reps = {r.node: r.rep for r in _local_contract(e).collect()}
    assert reps == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7}
