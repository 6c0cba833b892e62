"""Wave-7 extension specs: time-aware feature engineering and
monitoring — trailing-window features, new-vs-returning actives,
period-over-period growth, scorer calibration, and daily anomaly
flags.

The reference's analytics stop at static cross-sections
(run_analysis.Rmd aggregates one school year); these add the
longitudinal shapes every production pipeline grows next. All of them
reduce events/orders to PER-PERIOD AGGREGATES first, then run windows
over the tiny period axis — raw rows are touched exactly once, in one
scan-side group-by.

Float discipline (learned from the wave-6 gap-fill tie): derived
ratios are emitted UNROUNDED (the gate's 9-significant-digit
canonicalization absorbs engine ULPs; an explicit ROUND creates
half-tie cliffs where engines disagree), and money sums go through the
exact DECIMAL helpers in operators/aggregates.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import ranking as _rank
from ..operators.aggregates import money_sum, oracle_money_sum
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "rolling_7d_user_value",
    """
    WITH per_day AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS epoch_day,
             SUM(value) AS day_value,
             CAST(COUNT(*) AS BIGINT) AS day_events
      FROM events GROUP BY 1, 2, 3
    )
    SELECT user_id, day, day_events, day_value,
           SUM(day_value) OVER (
             PARTITION BY user_id ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS value_7d,
           CAST(SUM(day_events) OVER (
             PARTITION BY user_id ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS events_7d
    FROM per_day
    """,
    "extension — trailing-window feature engineering: per-user 7-day "
    "rolling value/event totals via a RANGE frame over integer epoch "
    "days (identical frame semantics on both engines; a time-RANGE "
    "frame skips gap days correctly where a ROWS frame would not). "
    "Raw events collapse to per-(user, day) aggregates in the scan "
    "stage group-by; the window then shuffles only those daily rows "
    "on user_id — the standard sessionless feature backfill shape",
)
def rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_day = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("epoch_day"),
            "value",
        )
        .groupBy("user_id", "day", "epoch_day")
        .agg(
            F.sum("value").alias("day_value"),
            F.count(F.lit(1)).alias("day_events"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return per_day.select(
        "user_id",
        "day",
        "day_events",
        "day_value",
        F.sum("day_value").over(w).alias("value_7d"),
        F.sum("day_events").over(w).cast("long").alias("events_7d"),
    )


@_spec(
    "daily_active_new_returning",
    """
    WITH user_day AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(day) AS first_day FROM user_day GROUP BY 1
    ),
    daily AS (
      SELECT ud.day,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new
      FROM user_day ud JOIN first_seen fs ON ud.user_id = fs.user_id
      GROUP BY 1
    )
    SELECT day, n_active, n_new,
           n_active - n_new AS n_returning,
           CAST(SUM(n_new) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
    """,
    "extension — growth accounting: daily active users split into new "
    "vs returning, plus the cumulative distinct-user curve WITHOUT a "
    "running COUNT(DISTINCT): first-touch attribution (min day per "
    "user, one shuffle on user_id) turns cumulative-distinct into a "
    "running SUM of arrivals over the tiny day axis — the "
    "exact-and-scalable form of the classic growth dashboard query",
)
def daily_active_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_day = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first_seen = user_day.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    daily = (
        user_day.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(
                (F.col("day") == F.col("first_day")).cast("int")
            ).cast("long").alias("n_new"),
        )
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


@_spec(
    "monthly_revenue_growth",
    f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             {oracle_money_sum("o_totalprice")} AS revenue
      FROM orders GROUP BY 1
    ),
    modal AS (
      SELECT month, o_orderpriority AS top_priority FROM (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               o_orderpriority,
               ROW_NUMBER() OVER (
                 PARTITION BY CAST(date_trunc('month', o_orderdate) AS DATE)
                 ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders GROUP BY 1, 2
      ) WHERE rn = 1
    )
    SELECT m.month, m.n_orders, m.revenue,
           m.revenue - lag(m.revenue) OVER (ORDER BY m.month)
             AS revenue_delta,
           (m.revenue - lag(m.revenue) OVER (ORDER BY m.month))
             / lag(m.revenue) OVER (ORDER BY m.month) AS growth_rate,
           md.top_priority
    FROM monthly m JOIN modal md ON m.month = md.month
    """,
    "extension — period-over-period reporting: monthly revenue (exact "
    "DECIMAL money sum — order-independent, engine-identical), "
    "month-over-month delta and growth rate via lag over the tiny "
    "month axis, and the per-month MODAL order priority "
    "(deterministic tie-break by priority label). One scan, one "
    "group-by per branch; every window runs over months, not orders",
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    monthly = orders.select(month, "o_totalprice").groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice").alias("revenue"),
    )
    pr = (
        orders.select(month, "o_orderpriority")
        .groupBy("month", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_pr = Window.partitionBy("month").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority")
    )
    modal = (
        pr.withColumn("rn", F.row_number().over(w_pr))
        .filter(F.col("rn") == 1)
        .select("month", F.col("o_orderpriority").alias("top_priority"))
    )
    w_m = Window.orderBy("month")
    lagged = F.lag("revenue").over(w_m)
    return (
        monthly.join(modal, "month")
        .select(
            "month",
            "n_orders",
            "revenue",
            (F.col("revenue") - lagged).alias("revenue_delta"),
            ((F.col("revenue") - lagged) / lagged).alias("growth_rate"),
            "top_priority",
        )
    )


@_spec(
    "score_calibration_deciles",
    """
    WITH d AS (
      SELECT lang, n_chars,
             CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INTEGER)
               AS decile
      FROM documents
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en
    FROM d GROUP BY 1 ORDER BY 1
    """,
    "extension — scorer calibration: the companion to "
    "auc_quality_score. Documents bucketed into score deciles by the "
    "two-phase distributed NTILE (operators/ranking.py — no "
    "single-task window), then per-decile positives and mass as EXACT "
    "integer numerators/denominators (no rounded ratios, no float "
    "cliffs); the calibration curve is n_en/n per decile",
)
def score_calibration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "n_chars", "doc_id"
    )
    bucketed = _rank.with_ntile(
        docs, ["n_chars", "doc_id"], 10, out_col="decile"
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum((F.col("lang") == "en").cast("int")).cast("long").alias("n_en"),
        )
        .orderBy("decile")
    )


@_spec(
    "anomaly_days_zscore",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT AVG(n) AS mu, stddev_samp(n) AS sigma FROM daily
    )
    SELECT d.day, d.n,
           (d.n - s.mu) / s.sigma AS z,
           ABS(d.n - s.mu) > 2 * s.sigma AS is_anomaly
    FROM daily d CROSS JOIN stats s
    """,
    "extension — volume monitoring: per-day event counts flagged "
    "against the global mean/stddev (|z| > 2). Raw events reduce to "
    "the day axis in one scan-side group-by; the 1-row stats table "
    "broadcast-joins back (BroadcastNestedLoopJoin of a scalar — the "
    "same pattern as zscore_global). z is emitted unrounded: the "
    "gate's 9-sig-digit canonicalization absorbs stddev ULPs",
)
def anomaly_days_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(F.to_date("ts").alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        ((F.col("n") - F.col("mu")) / F.col("sigma")).alias("z"),
        (F.abs(F.col("n") - F.col("mu")) > 2 * F.col("sigma")).alias(
            "is_anomaly"
        ),
    )
