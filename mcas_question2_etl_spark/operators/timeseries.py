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

from collections.abc import Sequence

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


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    bucket_seconds: int,
    value_col: str,
) -> DataFrame:
    """Finest-grain hypertable rollup: one row per (keys, bucket) with
    additive summaries ``n_events`` / ``sum_key`` / ``min_us`` /
    ``max_us``. The bucket is integer epoch-micros floor-divided — the
    TimescaleDB ``time_bucket`` shape, exact in any engine.

    This is the table you MATERIALIZE (continuous-aggregate style):
    every coarser grain derives from it via :func:`rollup_coarser`
    without ever rescanning raw events. At 100 TB the raw scan happens
    once; hour->day->week rollups then reduce an already
    events/bucket_seconds-times-smaller table.
    """
    us = bucket_seconds * 1_000_000
    bucket = (F.floor(F.unix_micros(F.col(ts_col)) / F.lit(us)) * us).alias(
        "bucket_us"
    )
    return df.groupBy(*keys, bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("long")).alias("sum_key"),
        F.min(F.unix_micros(F.col(ts_col))).alias("min_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("max_us"),
    )


def rollup_coarser(
    fine: DataFrame, keys: Sequence[str], coarse_seconds: int
) -> DataFrame:
    """Derive a coarser grain FROM a finer rollup (never from raw
    events): additive merge of the summaries under the coarser bucket.
    Requires ``coarse_seconds`` to be a multiple of the fine grain so
    every fine bucket nests in exactly one coarse bucket."""
    us = coarse_seconds * 1_000_000
    coarse = (F.floor(F.col("bucket_us") / F.lit(us)) * us).alias("bucket_us")
    return fine.groupBy(*keys, coarse).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_key").alias("sum_key"),
        F.min("min_us").alias("min_us"),
        F.max("max_us").alias("max_us"),
    )


def ewma_half(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Recursive EWMA with alpha = 1/2 (ewma_1 = x_1; ewma_i =
    x_i/2 + ewma_{i-1}/2) as ONE window pass — no iteration, no UDF.

    The recursion unrolls to a prefix sum: with row number j per
    series, ewma_i = cumsum(u)_i / 2^i where u_1 = 2*x_1 and
    u_j = x_j * 2^(j-1). Because alpha is dyadic, every term is an
    integer times a power of two, so the doubles are EXACT (no
    accumulation error, no partition-order sensitivity) as long as
    series length stays under ~50 bits of dynamic range — engine-
    portable to the bit. One shuffle on the series key; both windows
    share it.
    """
    w = Window.partitionBy(*keys).orderBy(order_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    j = F.row_number().over(w)
    u = F.when(j == 1, F.col(value_col) * 2.0).otherwise(
        F.col(value_col) * F.pow(F.lit(2.0), j - 1)
    )
    return (
        df.withColumn("__j", j)
        .withColumn("__u", u)
        .withColumn("ewma", F.sum("__u").over(wrun) / F.pow(F.lit(2.0), F.col("__j")))
        .drop("__j", "__u")
    )


def ewma_half_sql(
    inner: str, keys: str, order_col: str, value_col: str
) -> str:
    """DuckDB twin of :func:`ewma_half` over an ``inner`` relation."""
    return f"""
      SELECT *,
             SUM(CASE WHEN j = 1 THEN {value_col} * 2.0
                      ELSE {value_col} * power(2.0, j - 1) END)
               OVER (PARTITION BY {keys} ORDER BY {order_col}
                     ROWS UNBOUNDED PRECEDING) / power(2.0, j) AS ewma
      FROM (SELECT *, CAST(ROW_NUMBER() OVER
                             (PARTITION BY {keys} ORDER BY {order_col})
                           AS BIGINT) AS j
            FROM {inner})
    """
