"""Wave-24 extension spec: interval coalescing (interval union) —
merged activity windows per event type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.intervals import coalesce_intervals
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


#: each event opens a 10-minute activity interval
_SPAN_US = 600 * 1_000_000


@_spec(
    "merged_activity_windows",
    f"""
    WITH iv AS (
      SELECT event_type, epoch_us(ts) AS s, epoch_us(ts) + {_SPAN_US} AS e
      FROM events
    ),
    flagged AS (
      SELECT event_type, s, e,
             MAX(e) OVER (PARTITION BY event_type ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ),
    grouped AS (
      SELECT event_type, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS period_id
      FROM flagged
    ),
    merged AS (
      SELECT event_type, period_id,
             MIN(s) AS period_start, MAX(e) AS period_end,
             COUNT(*) AS n_merged
      FROM grouped GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_periods,
           CAST(SUM(period_end - period_start) AS BIGINT) AS covered_us,
           CAST(MAX(n_merged) AS BIGINT) AS max_merged,
           CAST(SUM(n_merged) AS BIGINT) AS n_events
    FROM merged GROUP BY 1
    """,
    "extension — interval coalescing (operators/intervals.py "
    "coalesce_intervals): merge each event's 10-minute activity span "
    "into disjoint covered periods per type (the interval-UNION op "
    "behind downtime reports and busy-period stitching; the dual of "
    "overlap_join). Two windows + the final agg share ONE shuffle on "
    "the key; the new-group test uses the EXCLUSIVE running max "
    "(rows ... 1 preceding) — the inclusive form never opens groups. "
    "Integer micros end to end",
)
def merged_activity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "event_type",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _SPAN_US).alias("e"),
    )
    merged = coalesce_intervals(iv, ["event_type"], "s", "e")
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.sum(F.col("period_end") - F.col("period_start")).alias("covered_us"),
        F.max("n_merged").alias("max_merged"),
        F.sum("n_merged").alias("n_events"),
    )
