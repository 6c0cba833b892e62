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


def position_based_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conversion_type: str = "purchase",
    touch_types: tuple = ("click", "view"),
    lookback_hours: int = 72,
    round_to: int = 6,
    order_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution:
    each conversion credits its FIRST touch 40%, LAST touch 40%, and
    splits 20% across the middles (1 touch -> 100%, 2 -> 50/50) —
    the standard middle ground between last-touch (recency-biased)
    and linear (drowns the bookends), extending
    :func:`last_touch_attribution`.

    Determinism: touch ordering is (ts, exact integer micros) within
    each conversion's lookback; credits are fixed IEEE fractions;
    the per-touch-type credit sum is ROUNDed (addend order). Scale:
    one user-key join bounded by the lookback window, two rank
    windows per conversion group.

    Output: (touch_type, n_credited_touches, credit).
    """
    conv = df.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ct"),
    )
    touch = df.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tt"),
        F.col(type_col).alias("touch_type"),
        F.col(order_col).alias("__oid"),
    )
    lb = lookback_hours * 3600 * 1_000_000
    joined = conv.join(touch, "u").where(
        (F.col("tt") < F.col("ct")) & (F.col("tt") >= F.col("ct") - lb)
    )
    from pyspark.sql import Window

    wa = Window.partitionBy("u", "ct").orderBy("tt", "__oid")
    wd = Window.partitionBy("u", "ct").orderBy(
        F.col("tt").desc(), F.col("__oid").desc()
    )
    wn = Window.partitionBy("u", "ct")
    ranked = joined.select(
        "touch_type",
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wd).alias("__rd"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    credit = (
        F.when(F.col("__n") == 1, F.lit(1.0))
        .when(F.col("__n") == 2, F.lit(0.5))
        .when(F.col("__ra") == 1, F.lit(0.4))
        .when(F.col("__rd") == 1, F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("__n") - 2))
    )
    return ranked.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_credited_touches"),
        F.round(F.sum(credit), round_to).alias("credit"),
    )


def position_based_attribution_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    conversion_type: str = "purchase",
    touch_types: tuple = ("click", "view"),
    lookback_hours: int = 72,
    round_to: int = 6,
    order_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`position_based_attribution`."""
    tt = ", ".join(f"'{t}'" for t in touch_types)
    lb = lookback_hours * 3600 * 1_000_000
    return f"""
    WITH conv AS (
      SELECT {user_col} AS u, epoch_us({ts_col}) AS ct
      FROM {table} WHERE {type_col} = '{conversion_type}'
    ),
    touch AS (
      SELECT {user_col} AS u, epoch_us({ts_col}) AS tt,
             {type_col} AS touch_type, {order_col} AS oid
      FROM {table} WHERE {type_col} IN ({tt})
    ),
    ranked AS (
      SELECT touch.touch_type,
             row_number() OVER (PARTITION BY conv.u, conv.ct
                                ORDER BY touch.tt, touch.oid) AS ra,
             row_number() OVER (PARTITION BY conv.u, conv.ct
                                ORDER BY touch.tt DESC, touch.oid DESC) AS rd,
             COUNT(*) OVER (PARTITION BY conv.u, conv.ct) AS n
      FROM conv JOIN touch ON touch.u = conv.u
      WHERE touch.tt < conv.ct AND touch.tt >= conv.ct - {lb}
    )
    SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_credited_touches,
           ROUND(SUM(CASE WHEN n = 1 THEN 1.0
                          WHEN n = 2 THEN 0.5
                          WHEN ra = 1 THEN 0.4
                          WHEN rd = 1 THEN 0.4
                          ELSE 0.2 / (n - 2) END), {round_to}) AS credit
    FROM ranked GROUP BY touch_type
    """
