"""Wave-8 extension specs: operational diagnostics — join-key skew
profiling (the pre-flight check for every big join in this repo) and
telemetry debounce dedup (near-time duplicate suppression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


def _skew_branch_sql(key: str) -> str:
    return f"""
    SELECT '{key}' AS key_name,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(cnt) AS BIGINT) AS max_freq,
           MAX(cnt) / CAST(SUM(cnt) AS DOUBLE) AS top_share
    FROM (SELECT {key}, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
    """


@_spec(
    "join_key_skew_report",
    "SELECT * FROM (\n"
    + "\nUNION ALL ".join(_skew_branch_sql(k) for k in _SKEW_KEYS)
    + ")",
    "extension — join-key skew diagnostics: for each candidate join "
    "key of the fact table, row count, distinct keys, hottest-key "
    "frequency and its share of all rows — the numbers that decide "
    "broadcast vs shuffle vs salting BEFORE a 100 TB join is launched "
    "(operators/skew.py is the mitigation; this is the detector). One "
    "column-pruned scan + one map-side-combined group-by per key; "
    "top_share is an exact int/int division, so no float cliffs",
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    branches = []
    for key in _SKEW_KEYS:
        per_key = (
            li.select(key)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        branches.append(
            per_key.agg(
                F.lit(key).alias("key_name"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.max("cnt").cast("long").alias("max_freq"),
                (F.max("cnt") / F.sum("cnt").cast("double")).alias("top_share"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


@_spec(
    "event_debounce_dedup",
    """
    WITH g AS (
      SELECT user_id, event_type, ts, event_id, value,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                          AND date_diff('second', prev_ts, ts) < 60
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM g GROUP BY 1, 2
    """,
    "extension — telemetry debounce: suppress same-(user, type) events "
    "arriving within 60s of the previous one (double-click/retry "
    "noise), the row-level sibling of dedup_exact for event streams. "
    "One lag window co-keyed with the final rollup — a single shuffle "
    "on (user, type); the streaming twin is "
    "dropDuplicatesWithinWatermark (streaming/windows.py)",
)
def event_debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.withColumn("prev_ts", F.lag("ts").over(w))
    debounced = (
        F.col("prev_ts").isNotNull()
        & (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") < 60)
    )
    return g.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(debounced.cast("int")).cast("long").alias("n_debounced"),
    )
