"""Bounded k-core peeling on an undirected (a < b) edge list.

The k-core is the maximal subgraph where every vertex keeps degree
>= k; it is the standard densification filter before community /
influence analysis (drop the low-degree fringe, keep the cohesive
core). Exact k-core is an iterate-to-fixpoint peel; to stay
oracle-expressible (DuckDB has no mutual recursion over degrees) this
operator runs a FIXED number of peel rounds and reports per-round
survivor counts — callers pick ``rounds`` >= the expected peel depth
(LSH/co-purchase graphs settle in a handful; the report makes
non-convergence visible instead of silent: a fixpoint shows as two
identical trailing rows).

The threshold is data-relative by default — the 25th-percentile
degree of the input graph (exact interpolated percentile, identical
definition in Spark's ``percentile`` and DuckDB's ``quantile_cont``)
— so the peel exercises real cascade behavior at any scale factor
instead of degenerating to a no-op or an empty graph under a
hard-coded k. (The median fully collapses this near-regular
co-purchase graph in two rounds; the lower quartile leaves a
surviving core, exercising cascade AND fixpoint.)

Scale shape: each round is one degree aggregation (fixed-width
(node, degree) rows) plus two semi-joins back onto the edge list —
all equi-joins on node ids, no vertex ever carries its neighbor list.
The 1-row threshold broadcast-joins everywhere. Rounds are
plan-composed lazily (no driver-side collect); lineage is cut per
round with localCheckpoint so R rounds cost R scans of the current
edge set, not a 2^R lineage blowup. (The oracle needs the same
discipline spelled differently: every unrolled CTE is MATERIALIZED,
otherwise DuckDB re-inlines the whole e0..e_{r-1} chain per
reference and the oracle goes exponential.)

Reference scope: extends the engine's graph surface (SURVEY.md §2.13
alongside pagerank / triangle_count / connected_components); the
reference repo has no graph layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("a").alias("n"))
        .unionByName(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def kcore_peel_report(edges: DataFrame, rounds: int) -> DataFrame:
    """Per-round survivor counts of ``rounds`` peel iterations at the
    input graph's 25th-percentile degree: (round, k_threshold, n_nodes,
    n_edges); round 0 is the input. Output has exactly rounds+1 rows."""
    cur = edges.select("a", "b").localCheckpoint(eager=False)
    kdf = (
        _degrees(cur)
        .agg(F.expr("percentile(cast(deg as double), 0.25)").alias("k"))
        .localCheckpoint(eager=False)
    )
    reports = []
    for r in range(rounds + 1):
        deg = _degrees(cur).localCheckpoint(eager=False)
        reports.append(
            deg.agg(
                F.lit(r).cast("int").alias("round"),
                F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("bigint").alias("n_nodes"),
            )
            .crossJoin(
                cur.agg(
                    F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("bigint").alias("n_edges")
                )
            )
            .crossJoin(F.broadcast(kdf))
            .select("round", F.col("k").alias("k_threshold"), "n_nodes", "n_edges")
        )
        if r == rounds:
            break
        keep = (
            deg.crossJoin(F.broadcast(kdf))
            .filter(F.col("deg").cast("double") >= F.col("k"))
            .select("n")
        )
        cur = (
            cur.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def kcore_peel_report_sql(edges_cte: str, rounds: int) -> str:
    """DuckDB twin: the peel unrolled as chained MATERIALIZED CTEs
    over ``e0`` (provided by ``edges_cte``, which must define a CTE
    named e0 with columns a, b)."""
    parts = [edges_cte]
    parts.append("""
    kt AS MATERIALIZED (
      SELECT quantile_cont(CAST(deg AS DOUBLE), 0.25) AS k FROM (
        SELECT n, COUNT(*) AS deg FROM (
          SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0
        ) GROUP BY n)
    )""")
    selects = []
    for r in range(rounds + 1):
        parts.append(f"""
    d{r} AS MATERIALIZED (
      SELECT n, COUNT(*) AS deg FROM (
        SELECT a AS n FROM e{r} UNION ALL SELECT b FROM e{r}
      ) GROUP BY n
    )""")
        selects.append(
            f"SELECT {r} AS round,"
            f" (SELECT k FROM kt) AS k_threshold,"
            f" CAST((SELECT COUNT(*) FROM d{r}) AS BIGINT) AS n_nodes,"
            f" CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS n_edges"
        )
        if r == rounds:
            break
        parts.append(f"""
    e{r + 1} AS MATERIALIZED (
      SELECT a, b FROM e{r}
      WHERE a IN (SELECT n FROM d{r}, kt WHERE CAST(deg AS DOUBLE) >= k)
        AND b IN (SELECT n FROM d{r}, kt WHERE CAST(deg AS DOUBLE) >= k)
    )""")
    return "WITH " + ",".join(parts) + "\n" + " UNION ALL ".join(selects)
