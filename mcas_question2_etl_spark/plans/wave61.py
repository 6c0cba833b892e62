"""Wave-61 extension specs: RANGE-frame rolling spend, periodogram
seasonality lines, Bollinger-band breakout days, mean-reciprocal-rank
retrieval eval, local clustering coefficient.

Reference scope: beyond-reference analytics (SURVEY §2.13). The range
frame closes the one window-frame kind (RANGE BETWEEN value PRECEDING)
the suite's window family had not exercised; the periodogram and
Bollinger specs extend the time-series family; MRR extends the ranking
eval family (AUC/NDCG); the clustering coefficient extends the
co-purchase graph-motif family (triangles/assortativity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import graph_metrics, timeseries
from ..operators.ranking import with_global_row_number
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "range_frame_rolling_spend",
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             CAST(date_diff('day', DATE '1990-01-01',
                            CAST(o_orderdate AS DATE)) AS INTEGER) AS day_idx,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    ),
    rolled AS (
      SELECT o_custkey, o_orderkey, day_idx,
             CAST(SUM(price) OVER w AS DOUBLE) AS spend_90d,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_90d
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY day_idx
                   RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey, o_orderkey, day_idx,
           ROUND(spend_90d, 2) AS spend_90d, n_orders_90d
    FROM rolled
    ORDER BY spend_90d DESC, o_orderkey
    LIMIT 100
    """,
    "window-frame surface — RANGE BETWEEN 89 PRECEDING (a true "
    "value-range frame over the day index, not a row frame): trailing "
    "90-day spend per customer in exact DECIMAL, then global top-100 "
    "via TakeOrdered (no single-task sort); the only shuffle is the "
    "customer-key exchange the window needs.",
)
def range_frame_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
        ).alias("day_idx"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_idx")
        .rangeBetween(-89, Window.currentRow)
    )
    rolled = o.select(
        "o_custkey",
        "o_orderkey",
        "day_idx",
        F.sum("price").over(w).cast("double").alias("spend_90d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_orders_90d"),
    )
    return (
        rolled.select(
            "o_custkey",
            "o_orderkey",
            "day_idx",
            F.round("spend_90d", 2).alias("spend_90d"),
            "n_orders_90d",
        )
        .orderBy(F.col("spend_90d").desc(), "o_orderkey")
        .limit(100)
    )


@_spec(
    "periodogram_event_periods",
    timeseries.periodogram_power_sql("events", "ts", [7, 14, 30]),
    "time-series op — Schuster periodogram lines at P in {7,14,30} "
    "days over the daily event-count series (seasonality detector): "
    "one day groupBy reduces events to the series, trig aggregate "
    "over days x periods; power is phase-invariant so the absolute "
    "epoch-day index needs no min-date scalar pass.",
)
def periodogram_event_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.periodogram_power(events, "ts", [7, 14, 30])


@_spec(
    "bollinger_breakout_days",
    timeseries.bollinger_breakouts_sql("events", "ts", "value"),
    "time-series op — Bollinger-band anomaly screen over the daily "
    "total event value: trailing 7-row mean +- 2 sample sigma, "
    "full-window rows only, breakout days with side labels; the "
    "window runs over the bounded daily series, never raw events.",
)
def bollinger_breakout_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.bollinger_breakouts(events, "ts", "value")


@_spec(
    "mrr_lang_retrieval",
    """
    WITH ranked AS (
      SELECT lang,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    )
    SELECT lang,
           CAST(MIN(rnk) AS BIGINT) AS first_rel_rank,
           ROUND(1.0 / MIN(rnk), 6) AS reciprocal_rank
    FROM ranked
    GROUP BY lang
    """,
    "ranking-eval op — mean reciprocal rank inputs per language "
    "'query' against the shared (n_chars DESC, doc_id) relevance "
    "ranking: the global row number uses the two-phase "
    "range-partitioned rank (operators/ranking.py), never a "
    "single-task global window; MRR itself is AVG(reciprocal_rank) "
    "over this table.",
)
def mrr_lang_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ranked = with_global_row_number(
        docs.select("lang", "n_chars", "doc_id"),
        [F.col("n_chars").desc(), F.col("doc_id")],
        out_col="rnk",
    )
    return ranked.groupBy("lang").agg(
        F.min("rnk").cast("bigint").alias("first_rel_rank"),
        F.round(1.0 / F.min("rnk"), 6).alias("reciprocal_rank"),
    )


_EDGES_CTE = """
    members AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
    ), bounded AS MATERIALIZED (
      SELECT g, item FROM members
      WHERE g IN (SELECT g FROM members GROUP BY g
                  HAVING COUNT(*) <= 8)
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT a.item AS a, b.item AS b
      FROM bounded a JOIN bounded b ON a.g = b.g AND a.item < b.item
    )"""


@_spec(
    "clustering_coefficient_copurchase",
    graph_metrics.clustering_coefficient_sql(_EDGES_CTE),
    "graph op — Watts-Strogatz average local clustering coefficient "
    "+ Newman transitivity of the co-purchase graph: per-node "
    "triangle credits ride the same forward-adjacency intersection "
    "as triangle_count (fan-out |E| + 3*#triangles rows, never the "
    "wedge blowup), degrees from the symmetric edge list; one "
    "summary row.",
)
def clustering_coefficient_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = graph_metrics.cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=8)
    return graph_metrics.clustering_coefficient(edges)
