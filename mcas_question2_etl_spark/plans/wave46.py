"""Wave-46 extension specs: string-pattern profiling, distributed id
gap audit, calendar dimension, 2-hop graph reach.

Reference scope: none exist in the reference repo (pandas/R ETL);
they extend the engine's wrangling-profiling, ingest-integrity,
dimension-generation, and graph surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import graph_metrics, profiling, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "string_pattern_customers",
    profiling.string_pattern_profile_sql("customer", "c_name"),
    "profiling op — format-mask profile of customer names (A/a/9 "
    "masking): surfaces mixed formats in one pattern-grain "
    "aggregation; pure string expressions, exact counts, MIN example "
    "as the deterministic representative.",
)
def string_pattern_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return profiling.string_pattern_profile(cust, "c_name")


@_spec(
    "event_id_gap_audit",
    profiling.id_gap_audit_sql("events", "event_id"),
    "ingest-integrity op — id-contiguity audit WITHOUT a global sort: "
    "range shuffle + per-partition consecutive deltas in parallel + "
    "boundary deltas from the #partitions-row (min,max) table (two-"
    "phase, same shape as the distributed ranks); all-integer exact "
    "(n_missing, n_gaps, max_gap).",
)
def event_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return profiling.id_gap_audit(events, "event_id")


@_spec(
    "calendar_dimension",
    timeseries.calendar_dimension_sql(),
    "dimension op — generated conformed calendar spanning the data's "
    "own [min, max] day (sequence-exploded from one aggregate row, no "
    "driver loop), with the cross-engine dow trap handled by "
    "computing ISO Monday=1 explicitly on both sides; all-integer.",
)
def calendar_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.calendar_dimension(events)


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
    "two_hop_copurchase_reach",
    graph_metrics.two_hop_reach_sql(_EDGES_CTE, seed_pct=5),
    "graph op — 1-hop and 2-hop reach on the co-purchase graph for a "
    "deterministic 5% md5 seed sample, expanded against the FULL "
    "graph (exact per-seed values): the dense-graph sum(deg^2) "
    "blowup (236M pair rows at sf0.1, median degree 106) drops to "
    "the seed fraction while the expansion estimate stays unbiased; "
    "all equi-joins on node ids, exact integers.",
)
def two_hop_copurchase_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = graph_metrics.cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=8)
    return graph_metrics.two_hop_reach(edges, seed_pct=5)
