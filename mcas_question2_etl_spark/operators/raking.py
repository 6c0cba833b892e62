"""Iterative proportional fitting (IPF / raking): adjust a
contingency table's cell weights so both margins match target totals —
the survey-weighting / panel-balancing primitive (Deming & Stephan
1940), and the third iterative numeric fixpoint in this engine after
k-means (operators/kmeans.py) and PageRank (operators/pagerank.py).

Each iteration is two scaling passes: divide every cell by its row
sum and multiply by the row target, then the same for columns. On a
DataFrame the margins are tiny aggregations (rows/cols-sized) that
broadcast back into the cell table — cells shuffle ONCE per scaling
on the margin key, and the cell table itself is |rows| x |cols|,
aggregated from the corpus a single time up front. A fixed iteration
count keeps the float sequence deterministic (same discipline as the
GLM/k-means oracles); IPF converges geometrically, so 4-6 rounds
reach practical convergence on well-conditioned tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ipf_fit_uniform(
    cells: DataFrame,
    row_col: str,
    col_col: str,
    value_col: str = "w",
    iters: int = 4,
) -> DataFrame:
    """Rake ``cells`` (one row per (row_col, col_col) with a positive
    ``value_col``) toward UNIFORM margins: every row label gets
    total/n_rows, every column label total/n_cols. Returns the fitted
    cell weights (row_col, col_col, fitted)."""
    total_rows = cells.select(row_col).distinct().count()
    total_cols = cells.select(col_col).distinct().count()
    tot = cells.agg(F.sum(value_col).alias("__t")).first()[0]
    row_target = tot / total_rows
    col_target = tot / total_cols
    fitted = cells.select(
        row_col, col_col, F.col(value_col).cast("double").alias("fitted")
    )
    for _ in range(iters):
        rsum = fitted.groupBy(row_col).agg(F.sum("fitted").alias("__rs"))
        fitted = (
            fitted.join(F.broadcast(rsum), row_col)
            .withColumn("fitted", F.col("fitted") * row_target / F.col("__rs"))
            .drop("__rs")
        )
        csum = fitted.groupBy(col_col).agg(F.sum("fitted").alias("__cs"))
        fitted = (
            fitted.join(F.broadcast(csum), col_col)
            .withColumn("fitted", F.col("fitted") * col_target / F.col("__cs"))
            .drop("__cs")
            .localCheckpoint(eager=False)
        )
    return fitted.select(row_col, col_col, "fitted")


def ipf_fit_uniform_sql(
    cells_cte: str,
    row_col: str,
    col_col: str,
    iters: int = 4,
) -> str:
    """DuckDB twin: the same fixed iteration count unrolled as CTE
    pairs (row scaling then column scaling per round), uniform
    targets derived in-query."""
    body = [
        f"t AS (SELECT SUM(w) AS tot, "
        f"(SELECT COUNT(DISTINCT {row_col}) FROM {cells_cte}) AS nr, "
        f"(SELECT COUNT(DISTINCT {col_col}) FROM {cells_cte}) AS nc "
        f"FROM {cells_cte})",
        f"f0 AS (SELECT {row_col}, {col_col}, CAST(w AS DOUBLE) AS fitted "
        f"FROM {cells_cte})",
    ]
    prev = "f0"
    for i in range(iters):
        r, c = f"r{i}", f"f{i}c"
        body.append(
            f"{r} AS (SELECT {row_col}, {col_col}, "
            f"fitted * (t.tot / t.nr) / SUM(fitted) OVER (PARTITION BY {row_col}) AS fitted "
            f"FROM {prev} CROSS JOIN t)"
        )
        body.append(
            f"{c} AS (SELECT {row_col}, {col_col}, "
            f"fitted * (t.tot / t.nc) / SUM(fitted) OVER (PARTITION BY {col_col}) AS fitted "
            f"FROM {r} CROSS JOIN t)"
        )
        prev = c
    return (
        ",\n    ".join(body)
        + f"\n    SELECT {row_col}, {col_col}, fitted FROM {prev}"
    )
