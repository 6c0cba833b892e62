"""Wave-10 extension spec: interval concurrency via a DISTRIBUTED
prefix sum — the sweep-line analytic, built on the two-phase scan
primitive in operators/ranking.py.

Peak concurrency ("how many sessions were active at once") is the
canonical interval-stabbing aggregate: explode each interval into a
(+1 at start, -1 at end) point, order all points on the time axis, and
the running sum at each point is the live-interval count. The textbook
SQL spelling is ``SUM(delta) OVER (ORDER BY t)`` — which Spark executes
as ONE task holding every point. ``with_running_sum`` replaces that
with a range shuffle + per-partition scans + a broadcast offset table,
so the sweep stays parallel at 100 TB while computing the identical
number (the DuckDB oracle IS the single-window spelling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.ranking import with_running_sum
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "session_concurrency_peak",
    """
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL
                       OR t_us - prev_us > 1800 * 1000000
                     THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT user_id,
             CAST(SUM(new_session) OVER
               (PARTITION BY user_id ORDER BY t_us, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
             t_us
      FROM flagged
    ),
    intervals AS (
      SELECT user_id, session_id,
             MIN(t_us) AS s_us, MAX(t_us) AS e_us
      FROM sessions GROUP BY 1, 2
    ),
    points AS (
      SELECT user_id, session_id, s_us AS t_us, CAST(1 AS BIGINT) AS delta
      FROM intervals
      UNION ALL
      SELECT user_id, session_id, e_us, -1 FROM intervals
    ),
    swept AS (
      SELECT SUM(delta) OVER (
               ORDER BY t_us, delta DESC, user_id, session_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS live
      FROM points
    )
    SELECT CAST((SELECT COUNT(*) FROM intervals) AS BIGINT) AS n_sessions,
           CAST(MAX(live) AS BIGINT) AS peak_concurrent
    FROM swept
    """,
    "extension — sweep-line interval analytics: peak concurrent "
    "sessions across all users (30-min gap sessionization -> "
    "[start, end] intervals -> +1/-1 endpoint points -> DISTRIBUTED "
    "prefix sum over the time axis via operators/ranking."
    "with_running_sum, the two-phase scan that replaces the "
    "single-task SUM() OVER (ORDER BY) window; starts sort before "
    "ends at equal timestamps so touching intervals count as "
    "concurrent). The oracle is the plain single-window spelling — "
    "same number, different execution shape",
)
def session_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("t_us") - F.col("prev_us") > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    intervals = (
        flagged.withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(F.min("t_us").alias("s_us"), F.max("t_us").alias("e_us"))
        .persist()  # consumed by the session count AND both point legs
    )
    points = intervals.select(
        "user_id",
        "session_id",
        F.col("s_us").alias("t_us"),
        F.lit(1).cast("long").alias("delta"),
    ).unionByName(
        intervals.select(
            "user_id",
            "session_id",
            F.col("e_us").alias("t_us"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    swept = with_running_sum(
        points,
        [F.col("t_us"), F.col("delta").desc(), F.col("user_id"), F.col("session_id")],
        "delta",
        out_col="live",
    )
    n_sessions = intervals.agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    return n_sessions.crossJoin(
        swept.agg(F.max("live").cast("long").alias("peak_concurrent"))
    )
