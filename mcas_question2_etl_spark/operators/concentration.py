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


def abc_classes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_cut: str = "0.80",
    b_cut: str = "0.95",
) -> DataFrame:
    """ABC (Pareto) classification: rank keys by a 2-decimal measure
    descending, class A = keys inside the first ``a_cut`` of cumulative
    value, B up to ``b_cut``, C the tail — the standard inventory/
    revenue-concentration rollup ("which 20% of parts carry 80% of
    revenue").

    Exactness: per-key values, the running prefix, the grand total and
    the two thresholds are ALL decimals (cuts are decimal literals, so
    threshold = cut * total is exact) — class assignment never touches
    a float, so no boundary key can flip between engines. Only the
    reported revenue share divides to double at the end.

    Scale shape: one groupBy to key grain, then the distributed
    two-phase running sum (:func:`.ranking.with_running_sum` — range
    shuffle + per-partition windows, never a single-task global
    window), a broadcast 1-row total, and a 3-row class rollup.
    """
    from .ranking import with_running_sum

    per_key = df.groupBy(key_col).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__v")
    )
    total = per_key.agg(F.sum("__v").alias("__tot"))
    run = with_running_sum(
        per_key,
        [F.col("__v").desc(), F.col(key_col)],
        "__v",
        out_col="__run",
    ).crossJoin(F.broadcast(total))
    classed = run.withColumn(
        "abc_class",
        F.when(
            F.col("__run") <= F.expr(f"CAST({a_cut} AS DECIMAL(3,2))") * F.col("__tot"),
            F.lit("A"),
        )
        .when(
            F.col("__run") <= F.expr(f"CAST({b_cut} AS DECIMAL(3,2))") * F.col("__tot"),
            F.lit("B"),
        )
        .otherwise(F.lit("C")),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("__v").cast("double").alias("class_value"),
            (F.sum("__v").cast("double") / F.max("__tot").cast("double")).alias(
                "value_share"
            ),
        )
    )


def abc_classes_sql(
    table: str,
    key_col: str,
    value_col: str,
    a_cut: str = "0.80",
    b_cut: str = "0.95",
) -> str:
    """DuckDB twin of :func:`abc_classes` (plain running-sum window —
    the oracle does not need the distributed construction)."""
    return f"""
    WITH pk AS (
      SELECT {key_col} AS k, SUM(CAST({value_col} AS DECIMAL(18,2))) AS v
      FROM {table} GROUP BY {key_col}
    ),
    t AS (SELECT SUM(v) AS tot FROM pk),
    run AS (
      SELECT k, v, tot,
             SUM(v) OVER (ORDER BY v DESC, k
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM pk, t
    ),
    classed AS (
      SELECT k, v, tot,
             CASE WHEN cum <= CAST({a_cut} AS DECIMAL(3,2)) * tot THEN 'A'
                  WHEN cum <= CAST({b_cut} AS DECIMAL(3,2)) * tot THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM run
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(v) AS DOUBLE) AS class_value,
           CAST(SUM(v) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE) AS value_share
    FROM classed GROUP BY abc_class
    """
