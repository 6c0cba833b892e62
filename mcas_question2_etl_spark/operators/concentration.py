"""Concentration metrics over grouped frequency distributions.

HHI (Herfindahl–Hirschman, Σ share²) and the Gini coefficient of a
group's term-frequency distribution quantify how concentrated a
corpus slice is on few tokens — the audit signal for training-mixture
health (a source whose token mass collapses onto boilerplate terms
shows HHI/Gini spikes long before eyeballing samples would).

Scale shape: one (group, term) count aggregation — the only shuffle
that touches corpus-sized data, with map-side combine — then
per-group Σn, Σn², and the rank-weighted Gini sum over the COUNT
table (vocabulary-sized, not corpus-sized). The Gini rank window
partitions by group, so each group sorts only its own vocabulary;
Σ i·x_i is invariant under tie ordering, so the tiebreak only pins
determinism, not the value.

Gini (ascending-rank form): G = 2·Σ i·x_i / (n·Σ x_i) − (n+1)/n.

Reference scope: extends SURVEY.md §2.13's corpus-audit surface
(alongside source_token_divergence / zipf_token_ranks); no analogue
in the reference repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_concentration(
    counts: DataFrame,
    group_col: str = "source",
    count_col: str = "n",
    order_tiebreak: str = "term",
) -> DataFrame:
    """(group, n_classes, total, hhi, gini) from a (group, class,
    count) table. ``counts`` must be pre-aggregated (one row per
    (group, class))."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(count_col).asc(), F.col(order_tiebreak).asc()
    )
    ranked = counts.withColumn("__i", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum(count_col).cast("bigint").alias("total"),
            F.sum(F.col(count_col).cast("double") * F.col(count_col)).alias("__ss"),
            F.sum(F.col("__i").cast("double") * F.col(count_col)).alias("__iw"),
        )
        .select(
            group_col,
            "n_classes",
            "total",
            (F.col("__ss") / (F.col("total").cast("double") * F.col("total"))).alias("hhi"),
            (
                F.lit(2.0) * F.col("__iw")
                / (F.col("n_classes").cast("double") * F.col("total"))
                - (F.col("n_classes") + 1).cast("double") / F.col("n_classes")
            ).alias("gini"),
        )
    )


def token_concentration_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of tokenize → count → :func:`group_concentration`."""
    return f"""
    WITH tc AS (
      SELECT {group_col}, t AS term, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT {group_col},
                   unnest(string_split({text_col}, ' ')) AS t
            FROM {table})
      GROUP BY {group_col}, t
    ),
    ranked AS (
      SELECT {group_col}, n,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY n ASC, term ASC) AS i
      FROM tc
    )
    SELECT {group_col},
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(n) AS BIGINT) AS total,
           SUM(CAST(n AS DOUBLE) * n)
             / (CAST(SUM(n) AS DOUBLE) * SUM(n)) AS hhi,
           2.0 * SUM(CAST(i AS DOUBLE) * n)
             / (CAST(COUNT(*) AS DOUBLE) * SUM(n))
             - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*) AS gini
    FROM ranked
    GROUP BY {group_col}
    """
