"""Wave-27 extension spec: full CDC apply with tombstones (deletes
suppress, re-inserts resurrect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import aggregates
from ..operators.upsert import apply_cdc
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "cdc_apply_with_deletes",
    """
    WITH changes AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'click' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    latest AS (
      SELECT user_id, value, op FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    ),
    live AS (SELECT user_id, value FROM latest WHERE op <> 'D')
    SELECT CAST((SELECT COUNT(*) FROM live) AS BIGINT) AS n_live,
           CAST((SELECT COUNT(*) FROM latest WHERE op = 'D') AS BIGINT)
             AS n_tombstoned,
           CAST((SELECT SUM(CAST(value AS DECIMAL(18,2))) FROM live) AS DOUBLE)
             AS sum_live_value
    """,
    "extension — full CDC apply (operators/upsert.py apply_cdc): "
    "Debezium/DMS semantics where the LAST change per key wins and a "
    "trailing tombstone removes the key (while delete-then-reinsert "
    "resurrects it) — the piece merge_upsert (no deletes) and "
    "changelog_latest_state (no tombstones) leave open; together the "
    "three cover the row-level mutation surface. One shuffle on the "
    "key, WindowGroupLimit top-1, tombstone filter after the "
    "latest-pick. Changelog synthesized from events (clicks = "
    "deletes); DECIMAL sum keeps the check exact",
)
def cdc_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    changes = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "click", "D").otherwise("U").alias("op"),
    )
    live = apply_cdc(changes, ["user_id"], ["ts", "event_id"])
    n_live = live.agg(F.count(F.lit(1)).alias("c"))
    n_tomb = (
        changes.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter((F.col("__rn") == 1) & (F.col("op") == "D"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    sums = live.agg(
        aggregates.money_sum("value").alias("s")
    )
    return (
        n_live.crossJoin(n_tomb)
        .crossJoin(sums)
        .select(
            F.col("c").alias("n_live"),
            F.col("d").alias("n_tombstoned"),
            F.col("s").alias("sum_live_value"),
        )
    )
