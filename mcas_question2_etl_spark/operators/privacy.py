"""K-anonymity / l-diversity release audit.

Before any tabular release or cross-team share, the standard privacy
question (Sweeney 2002; Machanavajjhala et al. 2007): how large are
the equivalence classes induced by the quasi-identifier columns
(k-anonymity), and how many distinct sensitive values does each class
hold (l-diversity)? A class of size 1 re-identifies a row outright; a
large class whose sensitive column is constant still leaks it.

Output is the class-size histogram enriched with the l-diversity
floor — (class_size k, n_classes, n_rows, min_l, frac_rows) — the
table a release gate thresholds on ("suppress classes with k < 5 or
l < 2").

Exactness: everything is COUNT/COUNT DISTINCT over exact keys; the
only division (frac_rows) is a single exact-bigint ratio.

Scale shape: one groupBy on the QI tuple (the corpus shuffle), then
histogram rollups over the CLASS table; the row total is a broadcast
1-row scalar.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> DataFrame:
    """(class_size, n_classes, n_rows, min_l, frac_rows) over the
    equivalence classes of ``quasi_cols``."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.countDistinct(sensitive_col).cast("bigint").alias("__l"),
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("__N"))
    return (
        classes.groupBy(F.col("__k").alias("class_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("__k").cast("bigint").alias("n_rows"),
            F.min("__l").alias("min_l"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "frac_rows", F.col("n_rows").cast("double") / F.col("__N")
        )
        .drop("__N")
    )


def k_anonymity_audit_sql(
    table: str,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> str:
    """DuckDB twin of :func:`k_anonymity_audit`."""
    qi = ", ".join(quasi_cols)
    return f"""
    WITH classes AS (
      SELECT {qi}, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT {sensitive_col}) AS BIGINT) AS l
      FROM {table} GROUP BY {qi}
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM {table})
    SELECT k AS class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           MIN(l) AS min_l,
           CAST(SUM(k) AS DOUBLE) / MAX(t.N) AS frac_rows
    FROM classes CROSS JOIN t
    GROUP BY k
    """
