"""Time-series regularization: calendar-spine gap fill + LOCF.

Event streams are irregular; downstream feature pipelines want a dense
per-(series, period) grid with explicit zeros for missing activity and
last-observation-carried-forward for slowly-changing measures. The
classic warehouse shape is a calendar-spine outer join, which is how
this is built:

1. one tiny aggregate finds the global [min_day, max_day] span;
2. ``sequence(min, max, interval 1 day)`` exploded on the DRIVER-FREE
   path (a 1-row DataFrame, exploded — never a driver loop) makes the
   day spine;
3. the spine cross-joins the distinct series keys (both sides tiny:
   days x series) and left-joins the per-day aggregates;
4. LOCF is ``last(value, ignorenulls=True)`` over the per-series
   day-ordered window — one shuffle on the series key.

At 100 TB the expensive input is step 3's left join, which shuffles the
*aggregated* per-(series, day) rows — already reduced by the group-by —
never raw events. (The spine is the PRESERVED side of the outer join,
which Spark cannot broadcast — BroadcastHashJoin only builds the
non-preserved side — so this is a shuffle join by design; the same
series-key exchange then feeds the LOCF window.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def daily_spine(df: DataFrame, ts_col: str) -> DataFrame:
    """One row per calendar day spanning ``min(ts)..max(ts)``."""
    span = df.agg(
        F.min(F.to_date(ts_col)).alias("__d0"),
        F.max(F.to_date(ts_col)).alias("__d1"),
    )
    return span.select(
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias("day")
    )


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    series_col: str,
    aggs: list[Column],
    locf_col: str,
) -> DataFrame:
    """Dense per-(series, day) grid with zero-filled counts and a
    carried-forward measure.

    ``aggs`` are the per-day aggregate expressions (must include an
    alias); ``locf_col`` names the produced column to carry forward
    (nulls on gap days replaced by the most recent non-null value).
    Adds ``<locf_col>_locf``.
    """
    per_day = (
        df.withColumn("day", F.to_date(ts_col))
        .groupBy(series_col, "day")
        .agg(*aggs)
    )
    spine = daily_spine(df, ts_col).crossJoin(
        df.select(series_col).distinct()
    )
    dense = spine.join(per_day, [series_col, "day"], "left")
    w = (
        Window.partitionBy(series_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.withColumn(
        f"{locf_col}_locf", F.last(locf_col, ignorenulls=True).over(w)
    )
