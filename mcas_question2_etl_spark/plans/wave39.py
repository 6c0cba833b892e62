"""Wave-39 extension specs: entropy quality gates, trailing-window
distinct counts, token-concentration audits, bounded k-core peeling,
and sequential event patterns.

Reference scope: none of these exist in the reference repo (pandas/R
ETL); they extend the engine's corpus-audit, time-series, and graph
surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import concentration, entropy, graph_metrics, kcore, text, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# --- per-doc entropy ---------------------------------------------------------

@_spec(
    "doc_entropy_metrics",
    entropy.doc_entropy_report_sql(),
    "text-quality op — per-document char/token Shannon entropy "
    "(CCNet-style gibberish/boilerplate signal): computed as a "
    "zero-shuffle Catalyst fold (array_sort + aggregate run-length "
    "pass inside the scan stage) while the oracle recomputes it via "
    "the explode->groupBy identity, making the differential "
    "genuinely two-algorithm.",
)
def doc_entropy_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return entropy.doc_entropy_report(docs)


# --- trailing 7-day distinct users ------------------------------------------

@_spec(
    "rolling_7d_distinct_users",
    timeseries.rolling_distinct_count_sql(),
    "time-series op — trailing-7-day distinct users per day via the "
    "explode-cover trick: distinct is not subtractable, so each "
    "deduped (day,user) row is exploded into the <=7 days it covers "
    "and re-counted — two fixed-width shuffles, no per-day key sets, "
    "no range self-join of raw events (which is what the oracle "
    "runs).",
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.rolling_distinct_count(events)


# --- token concentration -----------------------------------------------------

@_spec(
    "token_concentration_audit",
    concentration.token_concentration_sql(),
    "corpus-audit op — per-source token-frequency HHI and Gini "
    "(training-mixture boilerplate detector): one corpus-sized "
    "(source,term) count shuffle with map-side combine; the rank "
    "window and concentration sums run over the vocabulary-sized "
    "count table only.",
)
def token_concentration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(text.tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return concentration.group_concentration(counts, "source", "n", "term")


# --- bounded k-core ----------------------------------------------------------

_KCORE_EDGES_CTE = """
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
    "kcore_copurchase_peel",
    kcore.kcore_peel_report_sql(_KCORE_EDGES_CTE, rounds=3),
    "graph op — bounded k-core peel (3 rounds at the input graph's "
    "25th-percentile degree, so the cascade is exercised at any scale factor) "
    "on the co-purchase graph: per-round (nodes, edges) survivor "
    "report; each round is one degree aggregation plus two semi-joins, "
    "all equi-joins on node ids, the 1-row threshold broadcast, "
    "lineage cut per round. Fixed rounds keep it oracle-expressible "
    "(unrolled MATERIALIZED CTEs); a fixpoint shows as identical "
    "trailing rows rather than silent truncation.",
)
def kcore_copurchase_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = graph_metrics.cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=8)
    return kcore.kcore_peel_report(edges, rounds=3)


# --- sequential event patterns ----------------------------------------------

@_spec(
    "event_trigram_patterns",
    """
    WITH seq AS (
      SELECT event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1 || '>' || t2 || '>' || t3 AS trigram,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, trigram LIMIT 15
    """,
    "behavioral op — top per-user event-type trigrams (order-2 "
    "extension of the transition matrix): lead windows partitioned on "
    "user_id (each user sorts its own partition), deterministic "
    "(ts, event_id) tiebreak, TakeOrdered top-15.",
)
def event_trigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "trigram")
        .limit(15)
    )
