"""Schema-level data profiling: functional-dependency and key-candidate
discovery.

The two profiling questions every inherited dataset gets asked first:
which columns determine which (functional dependencies — the basis
for normalization, join-key selection, and "is this denormalized
copy consistent" checks), and which columns could serve as keys
(uniqueness profiling). Both are pure COUNT/COUNT DISTINCT pipelines —
exact bigints, single final ratios, nothing to round.

Scale shape: each FD pair is one (lhs) groupBy over the table with
map-side combine followed by a class-table reduction; the key profile
is ONE pass computing all per-column distincts in a single aggregate
(Spark expands multi-distinct aggregates via grouping-id, still one
scan), then a static unpivot of the 1-row result.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def functional_dependency_audit(
    df: DataFrame,
    pairs: Sequence[tuple[str, str]],
) -> DataFrame:
    """One row per candidate FD lhs -> rhs: (lhs_col, rhs_col,
    n_classes, n_violating, max_rhs_per_class, fd_holds)."""
    outs = []
    for lhs, rhs in pairs:
        classes = df.groupBy(lhs).agg(
            F.countDistinct(rhs).cast("bigint").alias("__l")
        )
        outs.append(
            classes.agg(
                F.lit(lhs).alias("lhs_col"),
                F.lit(rhs).alias("rhs_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_classes"),
                F.sum((F.col("__l") > 1).cast("bigint"))
                .cast("bigint")
                .alias("n_violating"),
                F.max("__l").alias("max_rhs_per_class"),
                (F.max("__l") == 1).alias("fd_holds"),
            )
        )
    return reduce(DataFrame.unionByName, outs)


def functional_dependency_audit_sql(
    table: str,
    pairs: Sequence[tuple[str, str]],
) -> str:
    """DuckDB twin of :func:`functional_dependency_audit`."""
    parts = []
    for lhs, rhs in pairs:
        parts.append(f"""
    SELECT '{lhs}' AS lhs_col, '{rhs}' AS rhs_col,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN l > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(MAX(l) AS BIGINT) AS max_rhs_per_class,
           MAX(l) = 1 AS fd_holds
    FROM (SELECT {lhs}, CAST(COUNT(DISTINCT {rhs}) AS BIGINT) AS l
          FROM {table} GROUP BY {lhs})""")
    return "\nUNION ALL\n".join(parts)


def key_candidate_profile(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """One row per column: (column, n_rows, n_distinct, n_nulls,
    uniqueness, is_key) — is_key when every row carries a distinct
    non-null value. All distincts computed in a single aggregate pass."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"__d_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"__z_{c}")
        )
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}', __d_{c}, __z_{c}")
    stacked = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {', '.join(stack_args)}) AS (column_name, n_distinct, n_nulls)",
    )
    return stacked.select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_distinct",
        "n_nulls",
        (F.col("n_distinct").cast("double") / F.col("__n")).alias("uniqueness"),
        ((F.col("n_distinct") == F.col("__n")) & (F.col("n_nulls") == 0)).alias(
            "is_key"
        ),
    )


def key_candidate_profile_sql(
    table: str,
    cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`key_candidate_profile`."""
    parts = []
    for c in cols:
        parts.append(f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS DOUBLE) / COUNT(*) AS uniqueness,
           COUNT(DISTINCT {c}) = COUNT(*)
             AND SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) = 0 AS is_key
    FROM {table}""")
    return "\nUNION ALL\n".join(parts)
