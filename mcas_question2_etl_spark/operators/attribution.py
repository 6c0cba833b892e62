"""Marketing-style conversion attribution over event streams.

Last-touch attribution: each conversion event is credited to the most
recent NON-conversion event by the same user inside a lookback
window, the baseline model every attribution stack starts from (and
the one whose counts are exactly integer — multi-touch fractional
models ride on the same touch assignment).

One-shuffle construction: instead of a conversions-to-touches range
join (which re-shuffles the corpus twice and can explode on bursty
users), a single user-keyed window pass computes, at every event, the
last preceding touch via ``last(..., ignorenulls)`` over
``rowsBetween(unboundedPreceding, -1)`` — conversions then just
filter. The deterministic (ts, tiebreak) order pins which of two
same-instant touches is "last" in both engines; the lookback check
compares exact integer epoch-micros. The touch type and touch time
come from the same window expression shape (identical predicate, so
the last non-null row is the same row for both columns).

Scale shape: one shuffle on the user key; the rollup is a
|channels|-row aggregation with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_touch_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    conv_type: str = "purchase",
    lookback_minutes: int = 7 * 24 * 60,
) -> DataFrame:
    """(channel, n_conversions) — channel is the last preceding
    non-conversion event type within the lookback, or 'none'."""
    is_touch = F.col(type_col) != conv_type
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col(ts_col))
    tagged = df.select(
        F.col(user_col),
        F.col(type_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        us.alias("__us"),
        F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True)
        .over(w)
        .alias("__touch_type"),
        F.last(F.when(is_touch, us), ignorenulls=True)
        .over(w)
        .alias("__touch_us"),
    )
    horizon = lookback_minutes * 60 * 1_000_000
    return (
        tagged.filter(F.col(type_col) == conv_type)
        .select(
            F.when(
                F.col("__touch_us").isNull()
                | (F.col("__us") - F.col("__touch_us") > horizon),
                F.lit("none"),
            )
            .otherwise(F.col("__touch_type"))
            .alias("channel")
        )
        .groupBy("channel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
    )


def last_touch_attribution_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    conv_type: str = "purchase",
    lookback_minutes: int = 7 * 24 * 60,
) -> str:
    """DuckDB twin of :func:`last_touch_attribution`."""
    horizon = lookback_minutes * 60 * 1_000_000
    return f"""
    WITH tagged AS (
      SELECT {type_col} AS t, epoch_us({ts_col}) AS us,
             last_value(CASE WHEN {type_col} <> '{conv_type}'
                             THEN {type_col} END IGNORE NULLS) OVER w
               AS touch_type,
             last_value(CASE WHEN {type_col} <> '{conv_type}'
                             THEN epoch_us({ts_col}) END IGNORE NULLS) OVER w
               AS touch_us
      FROM {table}
      WINDOW w AS (
        PARTITION BY {user_col} ORDER BY {ts_col}, {tiebreak_col}
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      )
    )
    SELECT CASE WHEN touch_us IS NULL OR us - touch_us > {horizon}
                THEN 'none' ELSE touch_type END AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM tagged WHERE t = '{conv_type}'
    GROUP BY 1
    """
