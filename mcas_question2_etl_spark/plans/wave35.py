"""Wave-35 extension specs: Theil-Sen robust trend (median of pairwise
slopes) and lagged cross-correlation between two event streams.
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


_DAILY_SQL = """
      SELECT event_type,
             CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
"""


@_spec(
    "theil_sen_daily_trend",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    slopes AS (
      SELECT a.event_type,
             CAST(b.c - a.c AS DOUBLE) / (b.day - a.day) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day > a.day
    ),
    ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type ORDER BY slope) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM slopes
    )
    SELECT event_type,
           CAST(MAX(m) AS BIGINT) AS n_pairs,
           MAX(CASE WHEN i = (m + 1) // 2 THEN slope END) AS median_slope
    FROM ranked GROUP BY 1
    """,
    "extension — Theil-Sen estimator: per-series robust trend as the "
    "MEDIAN of all pairwise slopes (up to ~29% outlier days cannot "
    "move it, unlike the OLS slope in group_ols). Slopes are exact "
    "ratios of integer (count, day) deltas, the median is the "
    "index-picked order statistic (no float interpolation — the "
    "repo's percentile discipline), and the pair join is per-series "
    "over DAYS (30 rows -> 435 slopes), never events. Completes the "
    "robust family (IQR outliers, winsorized stats, bootstrap "
    "median) with the robust TREND",
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("c").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("c").alias("c2")
    )
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("d2") > F.col("d1"))
        .select(
            "event_type",
            ((F.col("c2") - F.col("c1")).cast("double") / (F.col("d2") - F.col("d1"))).alias(
                "slope"
            ),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    wc = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wc).alias("m"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.max(
            F.when(F.col("i") == F.expr("(m + 1) div 2"), F.col("slope")).otherwise(
                None
            )
        ).alias("median_slope"),
    )


_LAGS = (-3, -2, -1, 0, 1, 2, 3)
_TYPE_X = "view"
_TYPE_Y = "purchase"


@_spec(
    "lagged_cross_correlation",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    x AS (SELECT day, CAST(c AS DOUBLE) AS vx FROM daily
          WHERE event_type = '{_TYPE_X}'),
    y AS (SELECT day, CAST(c AS DOUBLE) AS vy FROM daily
          WHERE event_type = '{_TYPE_Y}'),
    pairs AS (
      SELECT l.lag, x.vx, y.vy
      FROM (SELECT unnest([{", ".join(map(str, _LAGS))}]) AS lag) l
      JOIN x ON TRUE
      JOIN y ON y.day = x.day + l.lag
    )
    SELECT CAST(lag AS INTEGER) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           (COUNT(*) * SUM(vx * vy) - SUM(vx) * SUM(vy))
             / sqrt((COUNT(*) * SUM(vx * vx) - SUM(vx) * SUM(vx))
                    * (COUNT(*) * SUM(vy * vy) - SUM(vy) * SUM(vy))) AS corr
    FROM pairs GROUP BY 1
    """,
    "extension — lagged cross-correlation between two event streams "
    "(does view activity LEAD purchase activity, and by how many "
    "days?): Pearson r of the day-aligned series at each lag in "
    "[-3, 3], computed from the five raw moments per lag (one "
    "aggregation; integer-valued doubles keep the moments exact). "
    "The series alignment is a tiny day-keyed self-join over the "
    "per-day rollup — events are scanned once. The lag argmax is "
    "the lead-lag estimate feeding attribution windows "
    "(asof_join_click_purchase's interval choice)",
)
def lagged_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    x = daily.filter(F.col("event_type") == _TYPE_X).select(
        "day", F.col("c").cast("double").alias("vx")
    )
    y = daily.filter(F.col("event_type") == _TYPE_Y).select(
        F.col("day").alias("yday"), F.col("c").cast("double").alias("vy")
    )
    lags = spark.createDataFrame([(l,) for l in _LAGS], "lag int")
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.col("yday") == F.col("day") + F.col("lag"))
    )
    n = F.count(F.lit(1))
    num = n * F.sum(F.col("vx") * F.col("vy")) - F.sum("vx") * F.sum("vy")
    den = F.sqrt(
        (n * F.sum(F.col("vx") * F.col("vx")) - F.sum("vx") * F.sum("vx"))
        * (n * F.sum(F.col("vy") * F.col("vy")) - F.sum("vy") * F.sum("vy"))
    )
    return pairs.groupBy("lag").agg(
        n.cast("long").alias("n_days"), (num / den).alias("corr")
    )
