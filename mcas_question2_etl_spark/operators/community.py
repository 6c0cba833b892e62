"""Label-propagation community detection (Raghavan et al. 2007),
synchronous, with a deterministic tie policy.

LPA's classic weakness is nondeterminism (random update order, random
tie breaks). This variant is fully deterministic and therefore
oracle-checkable: updates are SYNCHRONOUS (round r+1 reads only round
r), every node adopts its neighbors' modal label, and ties break by
(count desc, label asc). Fixed ``rounds`` keeps it SQL-expressible —
the same bounded-unroll discipline as the k-core/IPF/Markov specs;
LSH-style near-dup graphs converge in 2-3 rounds because components
are dense and shallow.

Scale shape: each round is one join of the symmetric edge list to the
(node, label) table — fixed-width rows — one (node, label) count
aggregation, and one per-node top-1 window over the node's DISTINCT
neighbor labels (bounded by degree). Nothing corpus-shaped persists
across rounds; lineage is cut per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """(community, n_members) after ``rounds`` synchronous LPA rounds
    over undirected edges (a, b); initial label = own node id.
    Isolated endpoints cannot occur (every node has >= 1 edge)."""
    sym = (
        edges.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = sym.select("u").distinct().select("u", F.col("u").alias("lbl"))
    w = Window.partitionBy("u").orderBy(F.col("__c").desc(), F.col("lbl"))
    for _ in range(rounds):
        labels = (
            sym.join(labels.select(F.col("u").alias("v"), "lbl"), "v")
            .groupBy("u", "lbl")
            .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("u", "lbl")
            .localCheckpoint(eager=False)
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )


def label_propagation_sql(edges_cte: str, rounds: int = 2) -> str:
    """DuckDB twin of :func:`label_propagation`. ``edges_cte`` must
    define a CTE named ``e0`` with columns (a, b)."""
    parts = [
        edges_cte,
        """
    sym AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e0
      UNION
      SELECT b AS u, a AS v FROM e0
    ),
    l0 AS (SELECT DISTINCT u, u AS lbl FROM sym)""",
    ]
    for r in range(rounds):
        parts.append(f"""
    l{r + 1} AS (
      SELECT u, lbl FROM (
        SELECT sym.u, l{r}.lbl,
               row_number() OVER (
                 PARTITION BY sym.u
                 ORDER BY COUNT(*) DESC, l{r}.lbl
               ) AS rk
        FROM sym JOIN l{r} ON l{r}.u = sym.v
        GROUP BY sym.u, l{r}.lbl
      ) WHERE rk = 1
    )""")
    return (
        "WITH " + ",".join(parts) + f"""
    SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l{rounds} GROUP BY lbl
    """
    )
