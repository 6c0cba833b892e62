"""Transitive closure over a DAG — Spark's answer to the recursive CTE.

SQL engines walk hierarchies (org charts, bill-of-materials, category
trees) with WITH RECURSIVE; Spark has no recursive CTE, so the closure
is an iterative frontier expansion: start from the edge list
(depth 1), join the frontier back onto the edges to hop one level
(depth + 1), accumulate, stop when the frontier empties. For a DAG of
depth d that is d joins — each shuffling only (node, node, depth)
triples, never payloads — with localCheckpoint truncating the plan per
round (same discipline as operators/clustering.connected_components).

The result is the ancestor table (ancestor, descendant, depth) with
depth = number of edges on the unique tree path (min depth under
multi-path DAGs, see note in :func:`transitive_closure`). Joining any
fact to it answers "roll this up to every ancestor level" without
per-level queries — the classic closure-table pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 30,
) -> DataFrame:
    """All (ancestor, descendant, depth) pairs reachable through
    ``edges`` (one row per child->parent link). Multi-path DAGs keep
    the MINIMUM depth per pair (one distinct per round bounds the
    frontier). Raises if ``max_depth`` rounds don't drain the
    frontier (cycle or deeper-than-expected graph — silently stopping
    would return a partial closure).
    """
    base = (
        edges.select(
            F.col(parent).alias("ancestor"),
            F.col(child).alias("descendant"),
            F.lit(1).alias("depth"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    hops = edges.select(
        F.col(child).alias("__c"), F.col(parent).alias("__p")
    ).localCheckpoint(eager=False)
    out = [base]
    frontier = base
    for _ in range(max_depth):
        nxt = (
            frontier.join(hops, frontier["ancestor"] == hops["__c"])
            .select(
                F.col("__p").alias("ancestor"),
                "descendant",
                (F.col("depth") + 1).alias("depth"),
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            result = out[0]
            for part in out[1:]:
                result = result.unionByName(part)
            # min depth per pair: multi-path DAGs can reach the same
            # ancestor at several depths
            return result.groupBy("ancestor", "descendant").agg(
                F.min("depth").alias("depth")
            )
        out.append(nxt)
        frontier = nxt
    raise RuntimeError(
        f"transitive_closure frontier not drained after {max_depth} rounds "
        "(cycle, or raise max_depth)"
    )
