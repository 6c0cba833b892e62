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

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.fanout import fan_out


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


#: ewma_half block width: weights inside a block stay within 2^63 (no
#: overflow), and the one-block carry truncation drops only terms
#: attenuated by >= 2^-128 from two blocks back — sub-ulp for any
#: series whose values span < ~59 bits of magnitude.
_EWMA_BLOCK = 64


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
    u_j = x_j * 2^(j-1). A naive unroll overflows double at j ~ 1024
    (2^j -> inf, every later row silently NaN), so the exponent is
    renormalized per BLOCK of B=64 rows: within a block the local
    index l in 1..B bounds every weight by 2^63, and the previous
    block's tail enters as a carry

        ewma_i = (S_blk(i) + T_prev / 2^B) / 2^l,   T_prev = lag(T, B)

    where S_blk is the within-block prefix sum of u_l = x * 2^(l-1)
    and T is the block total (every non-final block is exactly full, so
    the row B positions back always carries the previous block's
    total). Contributions older than TWO blocks are attenuated by
    2^-128 and truncated — below double ulp for any series whose
    values span < ~59 bits, and the SQL twin truncates identically, so
    engines still agree bit-for-bit. Because alpha is dyadic, every
    surviving term is an integer times a power of two: exact doubles,
    no partition-order sensitivity, arbitrary series length. One
    shuffle on the series key; all windows share it.
    """
    B = _EWMA_BLOCK
    w = Window.partitionBy(*keys).orderBy(order_col)
    j = F.row_number().over(w)
    df2 = (
        df.withColumn("__j", j)
        .withColumn("__blk", ((F.col("__j") - 1) / B).cast("long"))
        .withColumn("__l", F.col("__j") - F.col("__blk") * B)
    )
    u = F.when(F.col("__j") == 1, F.col(value_col) * 2.0).otherwise(
        F.col(value_col) * F.pow(F.lit(2.0), F.col("__l") - 1)
    )
    df2 = df2.withColumn("__u", u)
    wblk_run = Window.partitionBy(*keys, "__blk").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wblk_all = Window.partitionBy(*keys, "__blk")
    wlag = Window.partitionBy(*keys).orderBy(order_col)
    df2 = df2.withColumn("__s", F.sum("__u").over(wblk_run)).withColumn(
        "__t", F.sum("__u").over(wblk_all)
    )
    t_prev = F.coalesce(F.lag("__t", B).over(wlag), F.lit(0.0))
    return (
        df2.withColumn(
            "ewma",
            (F.col("__s") + t_prev / F.pow(F.lit(2.0), F.lit(B)))
            / F.pow(F.lit(2.0), F.col("__l")),
        )
        .drop("__j", "__blk", "__l", "__u", "__s", "__t")
    )


def ewma_half_sql(
    inner: str, keys: str, order_col: str, value_col: str
) -> str:
    """DuckDB twin of :func:`ewma_half` over an ``inner`` relation —
    the same block-renormalized unroll, truncated identically."""
    B = _EWMA_BLOCK
    return f"""
      SELECT * EXCLUDE (j, blk, l, u, s, t),
             (s + COALESCE(LAG(t, {B}) OVER
                             (PARTITION BY {keys} ORDER BY {order_col}),
                           0.0) / power(2.0, {B})) / power(2.0, l) AS ewma
      FROM (
        SELECT *,
               SUM(u) OVER (PARTITION BY {keys}, blk ORDER BY {order_col}
                            ROWS UNBOUNDED PRECEDING) AS s,
               SUM(u) OVER (PARTITION BY {keys}, blk) AS t
        FROM (
          SELECT *,
                 CASE WHEN j = 1 THEN {value_col} * 2.0
                      ELSE {value_col} * power(2.0, l - 1) END AS u
          FROM (SELECT *,
                       CAST(ROW_NUMBER() OVER
                              (PARTITION BY {keys} ORDER BY {order_col})
                            AS BIGINT) AS j,
                       CAST((ROW_NUMBER() OVER
                              (PARTITION BY {keys} ORDER BY {order_col}) - 1)
                            // {B} AS BIGINT) AS blk,
                       CAST((ROW_NUMBER() OVER
                              (PARTITION BY {keys} ORDER BY {order_col}) - 1)
                            % {B} + 1 AS BIGINT) AS l
                FROM {inner})))
    """


def cusum_changepoint(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "daily_mean",
) -> DataFrame:
    """Single-changepoint detection by the CUSUM statistic: for the
    series ``x_1..x_n``, ``S_t = sum_{i<=t} (x_i - xbar)``; the
    changepoint estimate is the ``t`` maximizing ``|S_t|`` (Page 1954 /
    the standard binary-segmentation first split), reported with the
    normalized statistic ``max|S_t| / (s * sqrt(n))`` and the pre/post
    segment means. Ties break to the earliest date.

    Scale shape: the input is a DAILY AGGREGATE (one row per day —
    years of data is thousands of rows), so the ordered prefix-sum
    window over a single partition is deliberate and cheap; the heavy
    lifting (raw events -> daily series) happens upstream in a keyed
    groupBy. For per-entity changepoints, partition the windows by the
    entity key and the same plan parallelizes.

    Returns one row: (cp_date, n_days, cusum_stat, pre_mean, post_mean).
    """
    w_ord = Window.orderBy(date_col).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    x = F.col(value_col)
    scored = (
        daily.withColumn("__xbar", F.avg(x).over(w_all))
        .withColumn("__sd", F.stddev_samp(x).over(w_all))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__s", F.sum(x - F.col("__xbar")).over(w_ord))
        .withColumn("__t", F.count(F.lit(1)).over(w_ord))
        .withColumn("__pre_sum", F.sum(x).over(w_ord))
    )
    best = scored.orderBy(
        F.abs(F.col("__s")).desc(), F.col(date_col).asc()
    ).limit(1)
    return best.select(
        F.col(date_col).alias("cp_date"),
        F.col("__n").cast("long").alias("n_days"),
        F.round(
            F.abs(F.col("__s")) / (F.col("__sd") * F.sqrt(F.col("__n"))), 6
        ).alias("cusum_stat"),
        F.round(F.col("__pre_sum") / F.col("__t"), 6).alias("pre_mean"),
        F.round(
            (F.col("__xbar") * F.col("__n") - F.col("__pre_sum"))
            / (F.col("__n") - F.col("__t")),
            6,
        ).alias("post_mean"),
    )


def cusum_changepoint_sql(daily_sql: str, date_col: str = "day",
                          value_col: str = "daily_mean") -> str:
    """DuckDB twin of :func:`cusum_changepoint`; ``daily_sql`` yields
    the daily series."""
    return f"""
    WITH d AS ({daily_sql}),
    stats AS (
      SELECT AVG({value_col}) AS xbar, stddev_samp({value_col}) AS sd,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM d
    ),
    scored AS (
      SELECT {date_col}, xbar, sd, n,
             SUM({value_col} - xbar)
               OVER (ORDER BY {date_col} ROWS UNBOUNDED PRECEDING) AS s,
             CAST(COUNT(*) OVER (ORDER BY {date_col} ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS t,
             SUM({value_col})
               OVER (ORDER BY {date_col} ROWS UNBOUNDED PRECEDING) AS pre_sum
      FROM d CROSS JOIN stats
    )
    SELECT {date_col} AS cp_date,
           n AS n_days,
           round(abs(s) / (sd * sqrt(n)), 6) AS cusum_stat,
           round(pre_sum / t, 6) AS pre_mean,
           round((xbar * n - pre_sum) / (n - t), 6) AS post_mean
    FROM scored
    ORDER BY abs(s) DESC, {date_col} ASC
    LIMIT 1
    """


# ---------------------------------------------------------------------------
# Trailing-window distinct counts (the explode-cover trick)
# ---------------------------------------------------------------------------


def rolling_distinct_count(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Per day, COUNT(DISTINCT key) over the trailing ``window_days``
    days — e.g. 7-day active users.

    Distinct-over-sliding-window does not decompose into a running
    aggregate (distinct is not subtractable), so the windowed form
    that works at scale is the explode-cover trick:

    1. dedup to (day, key) — the only corpus-sized shuffle, with
       map-side combine;
    2. each (day, key) emits the ``window_days`` days it CONTRIBUTES
       to (``sequence(day, day + w-1)`` exploded — a bounded x W
       blowup of the already-deduped activity table, not of raw
       events);
    3. COUNT(DISTINCT key) per covered day, restricted to days that
       actually appear in the data.

    Versus the collect_set-over-range-window alternative this never
    materializes a per-day key SET on one executor; both shuffles
    carry fixed-width rows. Returns (day, n_distinct), one row per
    observed day.
    """
    active = (
        df.select(
            F.col(ts_col).cast("date").alias("day"),
            F.col(key_col).alias("__k"),
        )
        .distinct()
    )
    covered = active.select(
        F.explode(
            F.expr(f"sequence(day, date_add(day, {window_days - 1}))")
        ).alias("day"),
        "__k",
    )
    observed = active.select("day").distinct()
    return (
        covered.join(observed, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("__k").cast("bigint").alias("n_distinct"))
    )


def rolling_distinct_count_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> str:
    """DuckDB twin via the direct range-join formulation (a different
    algorithm than the explode-cover trick — same semantics)."""
    return f"""
    WITH au AS (
      SELECT DISTINCT CAST({ts_col} AS DATE) AS day, {key_col} AS k
      FROM {table}
    ),
    days AS (SELECT DISTINCT day FROM au)
    SELECT d.day,
           CAST(COUNT(DISTINCT a.k) AS BIGINT) AS n_distinct
    FROM days d
    JOIN au a ON a.day BETWEEN d.day - {window_days - 1} AND d.day
    GROUP BY d.day
    """


# ---------------------------------------------------------------------------
# Time-weighted averages (TWAP)
# ---------------------------------------------------------------------------


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Interval-weighted mean of ``value_col`` per (keys, day): each
    observation is weighted by how long it REMAINED the current value
    (seconds until the next observation in the same key-day), the
    standard TWAP/sensor-averaging correction for irregular sampling
    where a plain AVG over-weights bursts.

    The last observation of each key-day has no forward interval and
    drops out (open intervals carry no defined weight); key-days with
    a single event therefore produce no row — explicit, not NaN.

    Weights are computed in exact integer MICROSECONDS (a bigint
    subtraction of epoch-micros, never float epoch seconds) so both
    engines weight bit-identically. Simultaneous observations need
    the deterministic ``tiebreak_col`` in the window order: with ties
    broken arbitrarily, WHICH of two same-instant values receives the
    zero-length interval (and which carries the span to the next
    event) is engine-dependent and the weighted sum diverges. One
    shuffle on the (keys, day) window; the aggregation rides the same
    partitioning.
    """
    keys = [F.col(k) for k in key_cols]
    day = F.col(ts_col).cast("date").alias("__day")
    w = Window.partitionBy(*key_cols, "__day").orderBy(ts_col, tiebreak_col)
    rows = (
        df.select(*keys, day, F.col(ts_col), F.col(tiebreak_col), F.col(value_col).alias("__v"))
        .withColumn("__us", F.unix_micros(F.col(ts_col)))
        .withColumn("__dt", F.lead("__us", 1).over(w) - F.col("__us"))
        .filter(F.col("__dt").isNotNull())
    )
    return (
        rows.groupBy(*key_cols, F.col("__day").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            (
                F.sum(F.col("__v") * F.col("__dt").cast("double"))
                / F.sum(F.col("__dt")).cast("double")
            ).alias("twap"),
        )
    )


def time_weighted_avg_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` (single key column)."""
    return f"""
    WITH r AS (
      SELECT {key_col}, CAST({ts_col} AS DATE) AS day, {value_col} AS v,
             lead(epoch_us({ts_col}), 1) OVER (
               PARTITION BY {key_col}, CAST({ts_col} AS DATE)
               ORDER BY {ts_col}, {tiebreak_col}
             ) - epoch_us({ts_col}) AS dt
      FROM {table}
    )
    SELECT {key_col}, day,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           SUM(v * CAST(dt AS DOUBLE)) / CAST(SUM(dt) AS DOUBLE) AS twap
    FROM r WHERE dt IS NOT NULL
    GROUP BY {key_col}, day
    """


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------


def seasonal_naive_backtest(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    season_days: int = 7,
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (prediction for day d
    = actual at day d - season) over per-key daily event counts — the
    standard baseline every real forecaster must beat, and a drift
    tripwire when its error jumps.

    Error metrics are chosen for exactness: WAPE = SUM|a - f| / SUM a
    and bias = (SUM f - SUM a) / SUM a aggregate INTEGER counts, so
    both numerator and denominator are engine-exact bigints and the
    single final division is reproducible; RMSE's SUM((a-f)^2) is an
    exact bigint too. (Per-day MAPE would average float ratios —
    order-dependent — for no extra information.) Scored days are those
    with BOTH an actual and a season-lagged actual, via a self-join of
    the daily rollup on (key, day - season); days absent from the data
    are absent from the score, explicitly — no zero-fill.

    Scale shape: the corpus reduces to the (key, day) daily table in
    one map-side-combined aggregate; the self-join and scoring run on
    that days-sized table.
    """
    daily = df.groupBy(
        F.col(key_col).alias("k"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    fc = daily.select(
        F.col("k"),
        F.date_add("d", season_days).alias("d"),
        F.col("a").alias("f"),
    )
    scored = daily.join(fc, ["k", "d"])
    return (
        scored.groupBy(F.col("k").alias(key_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.abs(F.col("a") - F.col("f"))).cast("bigint").alias("__ae"),
            F.sum("a").cast("bigint").alias("__sa"),
            F.sum("f").cast("bigint").alias("__sf"),
            F.sum(
                (F.col("a") - F.col("f")) * (F.col("a") - F.col("f"))
            ).cast("bigint").alias("__se"),
        )
        .select(
            key_col,
            "n_days",
            (F.col("__ae").cast("double") / F.col("__sa")).alias("wape"),
            (
                (F.col("__sf") - F.col("__sa")).cast("double") / F.col("__sa")
            ).alias("bias"),
            F.sqrt(F.col("__se").cast("double") / F.col("n_days")).alias("rmse"),
        )
    )


def seasonal_naive_backtest_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    season_days: int = 7,
) -> str:
    """DuckDB twin of :func:`seasonal_naive_backtest`."""
    return f"""
    WITH daily AS (
      SELECT {key_col} AS k, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS a
      FROM {table} GROUP BY 1, 2
    ),
    scored AS (
      SELECT x.k, x.a, y.a AS f
      FROM daily x
      JOIN daily y ON y.k = x.k AND y.d = x.d - {season_days}
    )
    SELECT k AS {key_col},
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(abs(a - f)) AS DOUBLE) / SUM(a) AS wape,
           CAST(SUM(f) - SUM(a) AS DOUBLE) / SUM(a) AS bias,
           sqrt(CAST(SUM((a - f) * (a - f)) AS DOUBLE) / COUNT(*)) AS rmse
    FROM scored GROUP BY k
    """


# ---------------------------------------------------------------------------
# Activity streaks (gaps-and-islands over calendar days)
# ---------------------------------------------------------------------------


def activity_streak_histogram(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Histogram of each key's LONGEST consecutive-active-day streak —
    the retention/habit metric gamified products report, computed with
    the classic gaps-and-islands identity: over a key's DISTINCT
    active days ordered ascending, ``day - row_number`` is constant
    exactly within a consecutive run, so grouping on that anchor
    yields run lengths with no self-join and no iteration.

    All-integer pipeline (dates, row numbers, counts, maxes) — exact
    in both engines, nothing to round.

    Scale shape: distinct (key, day) is the corpus-reducing
    aggregation; the islands window and both rollups run per key on
    day-grain data (bounded by the observation span). One shuffle on
    the key.
    """
    days = df.select(
        F.col(key_col), F.col(ts_col).cast("date").alias("__day")
    ).distinct()
    w = Window.partitionBy(key_col).orderBy("__day")
    runs = (
        days.withColumn(
            "__anchor",
            F.date_sub(F.col("__day"), F.row_number().over(w)),
        )
        .groupBy(key_col, "__anchor")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__run"))
    )
    longest = runs.groupBy(key_col).agg(F.max("__run").alias("__best"))
    return longest.groupBy(F.col("__best").alias("streak_days")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )


def activity_streak_histogram_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`activity_streak_histogram`."""
    return f"""
    WITH days AS (
      SELECT DISTINCT {key_col} AS k, CAST({ts_col} AS DATE) AS day
      FROM {table}
    ),
    runs AS (
      SELECT k, day - CAST(row_number() OVER (PARTITION BY k ORDER BY day)
                           AS INTEGER) AS anchor
      FROM days
    ),
    lens AS (
      SELECT k, anchor, CAST(COUNT(*) AS BIGINT) AS run
      FROM runs GROUP BY k, anchor
    ),
    best AS (SELECT k, MAX(run) AS best FROM lens GROUP BY k)
    SELECT best AS streak_days, CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM best GROUP BY best
    """


def calendar_dimension(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Generated calendar dimension spanning the data's [min, max]
    day: (day, year, month, day_of_month, quarter, iso_dow, iso_week,
    is_weekend) — the standard conformed date dimension every
    warehouse joins against, derived from the data's own span so it
    never goes stale.

    Engine-portability note: "day of week" is the classic cross-
    engine trap (Spark ``dayofweek`` counts Sunday=1, DuckDB ``dow``
    Sunday=0) — both sides compute the ISO form (Monday=1) explicitly.
    All-integer output; the spine is sequence-exploded from one
    2-column aggregate row, never a driver loop.
    """
    span = df.agg(
        F.min(F.col(ts_col).cast("date")).alias("__d0"),
        F.max(F.col(ts_col).cast("date")).alias("__d1"),
    )
    days = span.select(
        F.explode(F.sequence("__d0", "__d1", F.expr("interval 1 day"))).alias(
            "day"
        )
    )
    iso_dow = (F.weekday("day") + 1).cast("int")
    return days.select(
        "day",
        F.year("day").cast("int").alias("year"),
        F.month("day").cast("int").alias("month"),
        F.dayofmonth("day").cast("int").alias("day_of_month"),
        F.quarter("day").cast("int").alias("quarter"),
        iso_dow.alias("iso_dow"),
        F.weekofyear("day").cast("int").alias("iso_week"),
        (iso_dow >= 6).alias("is_weekend"),
    )


def calendar_dimension_sql(
    table: str = "events",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`calendar_dimension`."""
    return f"""
    WITH span AS (
      SELECT MIN(CAST({ts_col} AS DATE)) AS d0,
             MAX(CAST({ts_col} AS DATE)) AS d1
      FROM {table}
    ),
    days AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    )
    SELECT day,
           CAST(year(day) AS INTEGER) AS year,
           CAST(month(day) AS INTEGER) AS month,
           CAST(day(day) AS INTEGER) AS day_of_month,
           CAST(quarter(day) AS INTEGER) AS quarter,
           CAST(isodow(day) AS INTEGER) AS iso_dow,
           CAST(weekofyear(day) AS INTEGER) AS iso_week,
           isodow(day) >= 6 AS is_weekend
    FROM days
    """


def user_burstiness_histogram(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_gaps: int = 5,
) -> DataFrame:
    """Histogram of per-key burstiness B = (sigma - mu)/(sigma + mu)
    over inter-event gaps (Goh & Barabasi 2008): B near -1 means
    metronome-regular activity, near 0 Poisson, toward +1 heavy
    bursts — the behavioral fingerprint that separates bots (regular)
    from humans (bursty) without any model.

    Determinism: gaps are exact integer micros; mu and sigma come
    from exact bigint moments, so each key's B is one IEEE expression
    on identical inputs (sqrt is correctly rounded — identical in
    both engines) and the bucket floor((B + 1) * 5) cannot flip.
    Keys with fewer than ``min_gaps`` gaps or mu = 0 (all
    simultaneous events) are excluded explicitly. B = -1 exactly
    (sigma = 0) lands exactly on bucket 0 in both engines.

    Scale shape: one shuffle on the key (the gap window), then
    key-grain moments and a 10-bucket rollup.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    gaps = (
        df.select(
            F.col(key_col),
            (
                F.lead(F.unix_micros(F.col(ts_col)), 1).over(w)
                - F.unix_micros(F.col(ts_col))
            ).alias("__g"),
        )
        .filter(F.col("__g").isNotNull())
    )
    per_key = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__g").cast("bigint").alias("__s"),
        # micros gaps square past bigint (a 3-hour gap is ~1e10 us);
        # accumulate the squares in exact decimal instead
        F.sum(F.col("__g").cast("decimal(38,0)") * F.col("__g")).alias("__s2"),
    )
    mu = F.col("__s").cast("double") / F.col("__n")
    var = (
        F.col("__s2").cast("double")
        - F.col("__s").cast("double") * F.col("__s") / F.col("__n")
    ) / F.col("__n")
    sigma = F.sqrt(var)
    b = (sigma - mu) / (sigma + mu)
    return (
        per_key.filter((F.col("__n") >= min_gaps) & (F.col("__s") > 0))
        .select(F.floor((b + 1) * 5).cast("int").alias("burst_bucket"))
        .groupBy("burst_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )


def user_burstiness_histogram_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_gaps: int = 5,
) -> str:
    """DuckDB twin of :func:`user_burstiness_histogram`."""
    return f"""
    WITH gaps AS (
      SELECT {key_col} AS k,
             lead(epoch_us({ts_col}), 1) OVER (
               PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col}
             ) - epoch_us({ts_col}) AS g
      FROM {table}
    ),
    pk AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(g) AS BIGINT) AS s,
             SUM(CAST(g AS HUGEINT) * g) AS s2
      FROM gaps WHERE g IS NOT NULL GROUP BY k
    ),
    b AS (
      SELECT k,
             (sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
              - CAST(s AS DOUBLE) / n)
             / (sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
                + CAST(s AS DOUBLE) / n) AS bb
      FROM pk WHERE n >= {min_gaps} AND s > 0
    )
    SELECT CAST(floor((bb + 1) * 5) AS INTEGER) AS burst_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM b GROUP BY 1
    """


def interarrival_profile(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-group inter-arrival profile over the group's GLOBAL event
    stream: (group, n_gaps, mean_gap_us, median_gap_us) — the arrival-
    rate table capacity planning reads ("how often does each event
    type fire, and is the median far below the mean" = burst skew).

    Exactness: gaps are integer micros; the mean is one division of
    exact bigints; the median is an explicit ELEMENT PICK (the
    (n+1)/2-th smallest via row_number, lower median) rather than any
    engine's interpolating percentile — integers out, no float.

    Scale shape: one shuffle on the group for the gap window, a
    second for the median rank (both group-keyed); moments ride the
    same partitioning.
    """
    w = Window.partitionBy(group_col).orderBy(ts_col, tiebreak_col)
    gaps = (
        df.select(
            F.col(group_col),
            (
                F.lead(F.unix_micros(F.col(ts_col)), 1).over(w)
                - F.unix_micros(F.col(ts_col))
            ).alias("__g"),
        )
        .filter(F.col("__g").isNotNull())
    )
    stats = gaps.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        (F.sum("__g").cast("double") / F.count(F.lit(1))).alias("mean_gap_us"),
    )
    wr = Window.partitionBy(group_col).orderBy("__g")
    med = (
        gaps.withColumn("__rn", F.row_number().over(wr))
        .join(F.broadcast(stats.select(group_col, "n_gaps")), group_col)
        .filter(F.col("__rn") == F.expr("(n_gaps + 1) div 2"))
        .select(group_col, F.col("__g").alias("median_gap_us"))
    )
    return stats.join(med, group_col).select(
        group_col, "n_gaps", "mean_gap_us", "median_gap_us"
    )


def interarrival_profile_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`interarrival_profile`."""
    return f"""
    WITH gaps AS (
      SELECT {group_col} AS g,
             lead(epoch_us({ts_col}), 1) OVER (
               PARTITION BY {group_col} ORDER BY {ts_col}, {tiebreak_col}
             ) - epoch_us({ts_col}) AS gap
      FROM {table}
    ),
    clean AS (SELECT g, gap FROM gaps WHERE gap IS NOT NULL),
    stats AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap_us
      FROM clean GROUP BY g
    ),
    ranked AS (
      SELECT g, gap,
             row_number() OVER (PARTITION BY g ORDER BY gap) AS rn
      FROM clean
    ),
    med AS (
      SELECT r.g, r.gap AS median_gap_us
      FROM ranked r JOIN stats s ON s.g = r.g
      WHERE r.rn = (s.n_gaps + 1) // 2
    )
    SELECT s.g AS {group_col}, s.n_gaps, s.mean_gap_us, m.median_gap_us
    FROM stats s JOIN med m ON m.g = s.g
    """


def xmr_control_chart(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """XmR (individuals / moving-range) control chart over per-group
    daily counts — the Shewhart process-control view of a metric:
    limits = mean +- 2.66 * mean moving range, days outside them are
    special-cause signals. The ops-dashboard standard for "did this
    pipeline's volume go out of control" without tuning thresholds.

    Determinism: daily counts and |consecutive differences| are exact
    integers; mrbar/xbar/limits are single divisions and one fixed
    IEEE expression, identical in both engines, so violation flags
    compare exact integers against bit-identical limits. Output per
    group: (n_days, xbar, mrbar, ucl, lcl, n_violations).

    Scale shape: the corpus reduces to the daily rollup once; the
    moving range is one lag window over day-grain data per group.
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("g").orderBy("d")
    mr = daily.withColumn(
        "__mr", F.abs(F.col("x") - F.lag("x", 1).over(w))
    )
    stats = mr.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("xbar"),
        (F.sum("__mr").cast("double") / F.count("__mr")).alias("mrbar"),
    )
    lim = stats.select(
        "g",
        "n_days",
        "xbar",
        "mrbar",
        (F.col("xbar") + F.lit(2.66) * F.col("mrbar")).alias("ucl"),
        (F.col("xbar") - F.lit(2.66) * F.col("mrbar")).alias("lcl"),
    )
    viol = (
        daily.join(F.broadcast(lim.select("g", "ucl", "lcl")), "g")
        .filter((F.col("x") > F.col("ucl")) | (F.col("x") < F.col("lcl")))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )
    return (
        lim.join(viol, "g", "left")
        .na.fill({"n_violations": 0})
        .select(
            F.col("g").alias(group_col),
            "n_days", "xbar", "mrbar", "ucl", "lcl", "n_violations",
        )
    )


def xmr_control_chart_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`xmr_control_chart`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    mr AS (
      SELECT g, d, x,
             abs(x - lag(x, 1) OVER (PARTITION BY g ORDER BY d)) AS m
      FROM daily
    ),
    stats AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS DOUBLE) / COUNT(*) AS xbar,
             CAST(SUM(m) AS DOUBLE) / COUNT(m) AS mrbar
      FROM mr GROUP BY g
    ),
    lim AS (
      SELECT g, n_days, xbar, mrbar,
             xbar + 2.66 * mrbar AS ucl,
             xbar - 2.66 * mrbar AS lcl
      FROM stats
    ),
    viol AS (
      SELECT daily.g, CAST(COUNT(*) AS BIGINT) AS n_violations
      FROM daily JOIN lim ON lim.g = daily.g
      WHERE daily.x > lim.ucl OR daily.x < lim.lcl
      GROUP BY daily.g
    )
    SELECT lim.g AS {group_col}, lim.n_days, lim.xbar, lim.mrbar,
           lim.ucl, lim.lcl, COALESCE(viol.n_violations, 0) AS n_violations
    FROM lim LEFT JOIN viol ON viol.g = lim.g
    """


def mann_kendall_trend(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Mann-Kendall monotonic-trend test over each group's daily
    counts — the nonparametric "is this metric drifting" detector
    (pairs-concordance S statistic), complementing the repo's
    Theil-Sen slope (wave-35): Theil-Sen answers "how steep",
    Mann-Kendall answers "is the trend statistically real" with a
    tie-corrected variance and continuity-corrected z.

    Exactness: S = #concordant - #discordant day pairs is an exact
    bigint; the tie-corrected variance numerator
    ``n(n-1)(2n+5) - sum(t(t-1)(2t+5))`` and both tau-b denominator
    factors are exact bigints; only the final /18, sqrt and division
    run in IEEE double on bit-identical integer inputs — no rounding
    needed.

    Scale shape: the corpus collapses to the (group, day) rollup
    once; the pair join is over DAYS per group (O(days^2) fixed-width
    rows, the same bounded kernel as theil_sen_daily_trend), never
    events. Output: (group, n_days, s_stat, var_s, tau_b, z).
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    a = daily.select("g", F.col("d").alias("di"), F.col("x").alias("xi"))
    b = daily.select("g", F.col("d").alias("dj"), F.col("x").alias("xj"))
    pairs = a.join(b, "g").where(F.col("di") < F.col("dj"))
    s = pairs.groupBy("g").agg(
        (
            F.sum((F.col("xj") > F.col("xi")).cast("long"))
            - F.sum((F.col("xj") < F.col("xi")).cast("long"))
        ).cast("bigint").alias("s_stat")
    )
    nd = daily.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("g", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie_var"),
            F.sum(F.col("t") * (F.col("t") - 1) / 2)
            .cast("bigint")
            .alias("tie_pairs"),
        )
    )
    n = F.col("n_days")
    var_num = (n * (n - 1) * (2 * n + 5) - F.col("tie_var")).cast("double")
    var_s = var_num / 18
    d_pairs = (n * (n - 1) / 2).cast("bigint")
    tau_den = F.sqrt(
        (d_pairs - F.col("tie_pairs")).cast("double")
        * d_pairs.cast("double")
    )
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(F.col("s_stat") > 0, (sd - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (sd + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(nd, "g")
        .join(ties, "g")
        .select(
            F.col("g").alias(group_col),
            "n_days",
            "s_stat",
            var_s.alias("var_s"),
            F.when(tau_den > 0, sd / tau_den).otherwise(F.lit(0.0)).alias("tau_b"),
            z.alias("z"),
        )
    )


def mann_kendall_trend_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`mann_kendall_trend`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    s AS (
      SELECT a.g,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1 ELSE 0 END)
                  - SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON b.g = a.g AND a.d < b.d
      GROUP BY a.g
    ),
    nd AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY g
    ),
    ties AS (
      SELECT g,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_var,
             CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS tie_pairs
      FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY g, x)
      GROUP BY g
    )
    SELECT s.g AS {group_col}, nd.n_days, s.s_stat,
           CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                - ties.tie_var AS DOUBLE) / 18 AS var_s,
           CASE WHEN (CAST(nd.n_days * (nd.n_days - 1) / 2 AS BIGINT)
                      - ties.tie_pairs) > 0
                THEN CAST(s.s_stat AS DOUBLE)
                     / sqrt(CAST(CAST(nd.n_days * (nd.n_days - 1) / 2
                                      AS BIGINT) - ties.tie_pairs AS DOUBLE)
                            * CAST(CAST(nd.n_days * (nd.n_days - 1) / 2
                                        AS BIGINT) AS DOUBLE))
                ELSE 0.0 END AS tau_b,
           CASE WHEN s.s_stat > 0
                THEN (CAST(s.s_stat AS DOUBLE) - 1)
                     / sqrt(CAST(nd.n_days * (nd.n_days - 1)
                                 * (2 * nd.n_days + 5)
                                 - ties.tie_var AS DOUBLE) / 18)
                WHEN s.s_stat < 0
                THEN (CAST(s.s_stat AS DOUBLE) + 1)
                     / sqrt(CAST(nd.n_days * (nd.n_days - 1)
                                 * (2 * nd.n_days + 5)
                                 - ties.tie_var AS DOUBLE) / 18)
                ELSE 0.0 END AS z
    FROM s JOIN nd ON nd.g = s.g JOIN ties ON ties.g = s.g
    """


def holt_linear_backtest(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) one-step-
    ahead backtest per group's daily counts — the forecasting upgrade
    over :func:`seasonal_naive_backtest` when the series trends:
    f_t = l + b, then l' = a*x + (1-a)*(l+b),
    b' = beta*(l'-l) + (1-beta)*b, initialized l_1 = x_1, b_1 = 0.

    Determinism: the recursion is a FIXED-ORDER IEEE fold over the
    day-sorted series — Spark runs it as one ``aggregate()`` (JVM
    codegen, no UDF) over the per-group sorted array, the oracle as a
    recursive CTE spelling the identical expressions, so level/trend/
    errors are bit-identical and nothing needs rounding. MAE counts
    errors from day 2 on.

    Scale shape: the corpus reduces to the daily rollup once; each
    group's series (array of DAYS, bounded by the calendar, not the
    corpus) folds inside one task. Output: (group, n_days, mae,
    level, trend, forecast_next).
    """
    a, b = float(alpha), float(beta)
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    series = daily.groupBy("g").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "x"))),
            lambda s: s["x"].cast("double"),
        ).alias("xs")
    )
    fold = F.expr(
        f"""
        aggregate(
          slice(xs, 2, greatest(size(xs) - 1, 0)),
          named_struct('l', xs[0], 'b', cast(0.0 as double),
                       'e', cast(0.0 as double), 'n', cast(0 as bigint)),
          (acc, x) -> named_struct(
            'l', {a}D * x + {1 - a}D * (acc.l + acc.b),
            'b', {b}D * ({a}D * x + {1 - a}D * (acc.l + acc.b) - acc.l)
                 + {1 - b}D * acc.b,
            'e', acc.e + abs(x - (acc.l + acc.b)),
            'n', acc.n + 1L),
          acc -> acc)
        """
    )
    return series.select(
        F.col("g").alias(group_col),
        F.size("xs").cast("bigint").alias("n_days"),
        fold.alias("__st"),
    ).select(
        group_col,
        "n_days",
        F.when(F.col("__st.n") > 0, F.col("__st.e") / F.col("__st.n"))
        .otherwise(F.lit(0.0))
        .alias("mae"),
        F.col("__st.l").alias("level"),
        F.col("__st.b").alias("trend"),
        (F.col("__st.l") + F.col("__st.b")).alias("forecast_next"),
    )


def holt_linear_backtest_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> str:
    """DuckDB twin of :func:`holt_linear_backtest` — the same IEEE
    recursion as a recursive CTE."""
    a, b = float(alpha), float(beta)
    return f"""
    WITH RECURSIVE daily AS (
      SELECT g, d, x,
             CAST(row_number() OVER (PARTITION BY g ORDER BY d) AS BIGINT) AS i
      FROM (SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM {table} GROUP BY 1, 2)
    ),
    rec AS (
      SELECT g, i, CAST(x AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b,
             CAST(0 AS DOUBLE) AS e, CAST(0 AS BIGINT) AS n
      FROM daily WHERE i = 1
      UNION ALL
      SELECT r.g, d.i,
             {a} * d.x + {1 - a} * (r.l + r.b),
             {b} * ({a} * d.x + {1 - a} * (r.l + r.b) - r.l)
               + {1 - b} * r.b,
             r.e + abs(d.x - (r.l + r.b)),
             r.n + 1
      FROM rec r JOIN daily d ON d.g = r.g AND d.i = r.i + 1
    ),
    last AS (
      SELECT g, CAST(MAX(i) AS BIGINT) AS n_days FROM daily GROUP BY g
    )
    SELECT r.g AS {group_col}, last.n_days,
           CASE WHEN r.n > 0 THEN r.e / r.n ELSE 0.0 END AS mae,
           r.l AS level, r.b AS trend, r.l + r.b AS forecast_next
    FROM rec r JOIN last ON last.g = r.g AND r.i = last.n_days
    """


def pettitt_changepoint(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_to: int = 9,
) -> DataFrame:
    """Pettitt single-changepoint test per group over daily counts —
    the rank-based (distribution-free) complement to
    :func:`cusum_changepoint`: U_t = sum_{i<=t} V_i with
    V_i = sum_j sign(x_i - x_j); K = max|U_t| locates the most likely
    break, with the classic significance approximation
    p = 2*exp(-6 K^2 / (n^3 + n^2)).

    Exactness: V and U are exact bigints (day-pair sign kernel +
    one prefix window over the per-group day series); the argmax day
    ties break to the EARLIEST day. Only p runs through exp() —
    rounded (default 9dp) because libm exp may differ in the last ulp
    across engines.

    Scale shape: corpus -> daily rollup once; the pair join is over
    DAYS per group (same bounded kernel as mann_kendall_trend).
    Output: (group, n_days, k_stat, change_day, p_value).
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    a = daily.select("g", F.col("d").alias("di"), F.col("x").alias("xi"))
    b = daily.select("g", F.col("d").alias("dj"), F.col("x").alias("xj"))
    v = (
        a.join(b, "g")
        .where(F.col("di") != F.col("dj"))
        .groupBy("g", "di")
        .agg(
            (
                F.sum((F.col("xi") > F.col("xj")).cast("long"))
                - F.sum((F.col("xi") < F.col("xj")).cast("long"))
            ).cast("bigint").alias("v")
        )
    )
    w = Window.partitionBy("g").orderBy("di")
    u = v.select("g", "di", F.sum("v").over(w).cast("bigint").alias("u"))
    nd = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    best = u.groupBy("g").agg(
        F.max(F.abs(F.col("u"))).cast("bigint").alias("k_stat"),
        F.min_by("di", F.struct(-F.abs(F.col("u")), F.col("di"))).alias(
            "change_day"
        ),
    )
    n = F.col("n_days").cast("double")
    k = F.col("k_stat").cast("double")
    return best.join(nd, "g").select(
        F.col("g").alias(group_col),
        "n_days",
        "k_stat",
        "change_day",
        F.round(
            2 * F.exp(-6 * k * k / (n * n * n + n * n)), round_to
        ).alias("p_value"),
    )


def pettitt_changepoint_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`pettitt_changepoint`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    v AS (
      SELECT a.g, a.d AS di,
             CAST(SUM(CASE WHEN a.x > b.x THEN 1 ELSE 0 END)
                  - SUM(CASE WHEN a.x < b.x THEN 1 ELSE 0 END)
                  AS BIGINT) AS v
      FROM daily a JOIN daily b ON b.g = a.g AND a.d <> b.d
      GROUP BY a.g, a.d
    ),
    u AS (
      SELECT g, di,
             CAST(SUM(v) OVER (PARTITION BY g ORDER BY di) AS BIGINT) AS u
      FROM v
    ),
    nd AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY g
    ),
    best AS (
      SELECT g, CAST(MAX(abs(u)) AS BIGINT) AS k_stat,
             MIN(di) FILTER (WHERE abs(u) = (SELECT MAX(abs(u2.u))
                                             FROM u u2 WHERE u2.g = u.g))
               AS change_day
      FROM u GROUP BY g
    )
    SELECT best.g AS {group_col}, nd.n_days, best.k_stat, best.change_day,
           ROUND(2 * exp(-6 * CAST(best.k_stat AS DOUBLE)
                         * CAST(best.k_stat AS DOUBLE)
                         / (CAST(nd.n_days AS DOUBLE) * nd.n_days * nd.n_days
                            + CAST(nd.n_days AS DOUBLE) * nd.n_days)),
                 {round_to}) AS p_value
    FROM best JOIN nd ON nd.g = best.g
    """


def dow_seasonality_index(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-of-week seasonality index per group: for each ISO weekday,
    (mean daily count on that weekday) / (overall mean daily count) —
    the multiplicative seasonal factor a day-grain forecast divides
    out (the detector feeding seasonal_naive_backtest's lag-7 choice).

    Exactness: both means are ratios of exact bigints over OBSERVED
    days (days with zero events don't enter either mean, symmetric
    numerator/denominator); the index is (s_d * days_total) * ... —
    spelled as one fixed expression of exact-int casts, identical in
    both engines. Scale: corpus -> daily rollup once; everything after
    is group x 7 rows.
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    # ISO dow 1=Mon..7=Sun, portable: dayofweek() is 1=Sun in Spark
    dowed = daily.withColumn(
        "dow", ((F.dayofweek("d") + 5) % 7 + 1).cast("int")
    )
    per_dow = dowed.groupBy("g", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("n_events"),
    )
    tot = dowed.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("t_days"),
        F.sum("x").cast("bigint").alias("t_events"),
    )
    idx = (
        F.col("n_events").cast("double") / F.col("n_days")
    ) / (F.col("t_events").cast("double") / F.col("t_days"))
    return per_dow.join(tot, "g").select(
        F.col("g").alias(group_col),
        "dow",
        "n_days",
        "n_events",
        idx.alias("seasonal_index"),
    )


def dow_seasonality_index_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`dow_seasonality_index`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    dowed AS (SELECT g, d, x, CAST(isodow(d) AS INTEGER) AS dow FROM daily),
    per_dow AS (
      SELECT g, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS n_events
      FROM dowed GROUP BY g, dow
    ),
    tot AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS t_days,
             CAST(SUM(x) AS BIGINT) AS t_events
      FROM dowed GROUP BY g
    )
    SELECT per_dow.g AS {group_col}, per_dow.dow, per_dow.n_days,
           per_dow.n_events,
           (CAST(n_events AS DOUBLE) / n_days)
             / (CAST(t_events AS DOUBLE) / t_days) AS seasonal_index
    FROM per_dow JOIN tot ON tot.g = per_dow.g
    """


def decayed_popularity(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    half_life_days: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Exponentially time-decayed popularity per group — the
    trending-score standard (each event counts 2^(-age/half_life),
    age measured in whole days from the corpus's max day): recency-
    weighted volume without a hard cutoff window.

    Determinism: ages are exact integer daydiffs from the single
    global max day; each DAY's weight is one pow() on an exact ratio
    (identical inputs both engines, 1-ulp libm risk), multiplied by
    the exact bigint daily count; the per-group sum over DAYS is
    ROUNDed (default 6dp) since summation order differs across
    engines. Scale: corpus -> daily rollup once; weighting and the
    final rollup run over day-grain rows.

    Output: (group, n_days, total_events, decayed_score).
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    mx = daily.agg(F.max("d").alias("__md"))
    weighted = daily.crossJoin(F.broadcast(mx)).select(
        "g",
        "x",
        (
            F.col("x").cast("double")
            * F.pow(
                F.lit(2.0),
                -F.datediff(F.col("__md"), F.col("d")).cast("double")
                / half_life_days,
            )
        ).alias("__wx"),
    )
    return weighted.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("total_events"),
        F.round(F.sum("__wx"), round_to).alias("decayed_score"),
    ).select(
        F.col("g").alias(group_col), "n_days", "total_events", "decayed_score"
    )


def decayed_popularity_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    half_life_days: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`decayed_popularity`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(d) AS md FROM daily),
    weighted AS (
      SELECT g, x,
             CAST(x AS DOUBLE)
               * pow(2.0, -CAST(date_diff('day', d, mx.md) AS DOUBLE)
                           / {half_life_days}) AS wx
      FROM daily CROSS JOIN mx
    )
    SELECT g AS {group_col}, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(x) AS BIGINT) AS total_events,
           ROUND(SUM(wx), {round_to}) AS decayed_score
    FROM weighted GROUP BY g
    """


def volume_drawdown(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Peak-to-trough drawdown of each group's daily volume — "what is
    the worst collapse from a prior peak this series has suffered",
    the ops-health statistic behind capacity planning and incident
    retrospectives (finance's max-drawdown applied to volume).

    Exactness: running peak and drawdown = peak - x are exact bigints
    (one ordered window over the daily rollup); the reported day is
    the EARLIEST day attaining the max drawdown. Output: (group,
    n_days, max_count, max_drawdown, drawdown_day).
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("g").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dd = daily.select(
        "g",
        "d",
        "x",
        (F.max("x").over(w) - F.col("x")).cast("bigint").alias("__dd"),
    )
    return dd.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max("x").cast("bigint").alias("max_count"),
        F.max("__dd").cast("bigint").alias("max_drawdown"),
        F.min_by("d", F.struct(-F.col("__dd"), F.col("d"))).alias(
            "drawdown_day"
        ),
    ).select(
        F.col("g").alias(group_col),
        "n_days",
        "max_count",
        "max_drawdown",
        "drawdown_day",
    )


def volume_drawdown_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`volume_drawdown`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    dd AS (
      SELECT g, d, x,
             CAST(MAX(x) OVER (PARTITION BY g ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - x
                  AS BIGINT) AS dd
      FROM daily
    )
    SELECT g AS {group_col}, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(x) AS BIGINT) AS max_count,
           CAST(MAX(dd) AS BIGINT) AS max_drawdown,
           MIN(d) FILTER (WHERE dd = (SELECT MAX(d2.dd) FROM dd d2
                                      WHERE d2.g = dd.g)) AS drawdown_day
    FROM dd GROUP BY g
    """


def mad_outlier_days(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    z_cut: float = 3.5,
) -> DataFrame:
    """Median-absolute-deviation outlier audit of each group's daily
    volume — the robust alternative to anomaly_days_zscore: mean/sd
    baselines are dragged by the very spikes they should flag; the
    median/MAD pair is 50%-breakdown robust. Flags days where
    0.6745 * |x - median| / MAD > ``z_cut`` (the classic modified
    z-score, Iglewicz & Hoaglin 1993).

    Exactness: the median and MAD are lower-median ELEMENT PICKS over
    integer daily counts, so both are exact bigints; the z comparison
    is one fixed IEEE expression per day on exact inputs. Groups with
    MAD = 0 flag any day deviating from the median (the conventional
    degenerate-case reading). Output: (group, n_days, median_x, mad,
    n_outliers).
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    wx = Window.partitionBy("g").orderBy("x")
    nd = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ranked = daily.select(
        "g", "d", "x", F.row_number().over(wx).cast("bigint").alias("rn")
    )
    med = (
        ranked.join(nd, "g")
        .where(F.col("rn") == F.expr("(n_days + 1) div 2"))
        .select("g", F.col("x").alias("med"))
    )
    devs = daily.join(med, "g").select(
        "g", "d", "x", F.abs(F.col("x") - F.col("med")).alias("__ad"),
        "med",
    )
    wad = Window.partitionBy("g").orderBy("__ad")
    mad = (
        devs.select(
            "g", "__ad", F.row_number().over(wad).cast("bigint").alias("rn")
        )
        .join(nd, "g")
        .where(F.col("rn") == F.expr("(n_days + 1) div 2"))
        .select("g", F.col("__ad").alias("mad"))
    )
    flagged = devs.join(mad, "g").select(
        "g",
        "med",
        "mad",
        F.when(
            F.col("mad") > 0,
            (
                F.lit(0.6745) * F.col("__ad").cast("double") / F.col("mad")
                > z_cut
            ),
        )
        .otherwise(F.col("__ad") > 0)
        .cast("int")
        .alias("__out"),
    )
    return flagged.groupBy("g", "med", "mad").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__out").cast("bigint").alias("n_outliers"),
    ).select(
        F.col("g").alias(group_col),
        "n_days",
        F.col("med").alias("median_x"),
        "mad",
        "n_outliers",
    )


def mad_outlier_days_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    z_cut: float = 3.5,
) -> str:
    """DuckDB twin of :func:`mad_outlier_days`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    nd AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY g),
    ranked AS (
      SELECT g, x, CAST(row_number() OVER (PARTITION BY g ORDER BY x)
                        AS BIGINT) AS rn
      FROM daily
    ),
    med AS (
      SELECT ranked.g, ranked.x AS med
      FROM ranked JOIN nd ON nd.g = ranked.g
      WHERE ranked.rn = (nd.n_days + 1) // 2
    ),
    devs AS (
      SELECT daily.g, daily.d, daily.x, abs(daily.x - med.med) AS ad, med.med
      FROM daily JOIN med ON med.g = daily.g
    ),
    adr AS (
      SELECT g, ad, CAST(row_number() OVER (PARTITION BY g ORDER BY ad)
                         AS BIGINT) AS rn
      FROM devs
    ),
    mad AS (
      SELECT adr.g, adr.ad AS mad
      FROM adr JOIN nd ON nd.g = adr.g
      WHERE adr.rn = (nd.n_days + 1) // 2
    )
    SELECT devs.g AS {group_col},
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(devs.med) AS BIGINT) AS median_x,
           CAST(MAX(mad.mad) AS BIGINT) AS mad,
           CAST(SUM(CASE WHEN mad.mad > 0
                    THEN CASE WHEN 0.6745 * CAST(devs.ad AS DOUBLE) / mad.mad
                              > {z_cut} THEN 1 ELSE 0 END
                    ELSE CASE WHEN devs.ad > 0 THEN 1 ELSE 0 END END)
                AS BIGINT) AS n_outliers
    FROM devs JOIN mad ON mad.g = devs.g
    GROUP BY devs.g
    """


def dow_anomaly_days(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    n_sigma: float = 2.0,
) -> DataFrame:
    """Weekday-conditioned volume anomalies: flag days whose count
    deviates more than ``n_sigma`` population-sd from THEIR WEEKDAY's
    mean, per group — the seasonality-adjusted upgrade of
    anomaly_days_zscore (whose global baseline flags every ordinary
    Sunday when weekends run hot; wave-36's autocorrelation report
    detects the problem, this fixes it).

    Exactness: per-(group, weekday) mean and variance derive from
    exact bigint power sums; the |x - mu| > n_sigma * sigma
    comparison is one fixed IEEE expression on exact-valued inputs —
    identical verdicts in both engines, no rounding. Output per
    (group, dow): (n_days, mu, sigma, n_anomalies).
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    dowed = daily.withColumn(
        "dow", ((F.dayofweek("d") + 5) % 7 + 1).cast("int")
    )
    stats = dowed.groupBy("g", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2"),
    )
    n = F.col("n_days").cast("double")
    mu = F.col("s1").cast("double") / n
    sig = F.sqrt(F.col("s2").cast("double") / n - mu * mu)
    based = stats.select("g", "dow", "n_days", mu.alias("mu"), sig.alias("sigma"))
    flagged = (
        dowed.join(based, ["g", "dow"])
        .select(
            "g",
            "dow",
            "n_days",
            "mu",
            "sigma",
            (
                F.abs(F.col("x").cast("double") - F.col("mu"))
                > n_sigma * F.col("sigma")
            ).cast("int").alias("__a"),
        )
    )
    return flagged.groupBy("g", "dow", "n_days", "mu", "sigma").agg(
        F.sum("__a").cast("bigint").alias("n_anomalies")
    ).select(
        F.col("g").alias(group_col), "dow", "n_days", "mu", "sigma",
        "n_anomalies",
    )


def dow_anomaly_days_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    n_sigma: float = 2.0,
) -> str:
    """DuckDB twin of :func:`dow_anomaly_days`."""
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    dowed AS (SELECT g, d, x, CAST(isodow(d) AS INTEGER) AS dow FROM daily),
    stats AS (
      SELECT g, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS s2
      FROM dowed GROUP BY g, dow
    ),
    based AS (
      SELECT g, dow, n_days,
             CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS mu,
             sqrt(CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)))
               AS sigma
      FROM stats
    )
    SELECT dowed.g AS {group_col}, dowed.dow, based.n_days, based.mu,
           based.sigma,
           CAST(SUM(CASE WHEN abs(CAST(dowed.x AS DOUBLE) - based.mu)
                         > {n_sigma} * based.sigma THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies
    FROM dowed JOIN based ON based.g = dowed.g AND based.dow = dowed.dow
    GROUP BY dowed.g, dowed.dow, based.n_days, based.mu, based.sigma
    """


def conversion_latency_quantiles(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    from_type: str = "click",
    to_type: str = "purchase",
    ps: tuple = (25, 50, 75, 90),
) -> DataFrame:
    """Latency percentiles from each user's FIRST ``from_type`` event
    to their first ``to_type`` AT OR AFTER it — the funnel-timing
    report (how long does click -> purchase take) that complements
    funnel_conversion's how-many with how-fast.

    Exactness: latencies are exact integer micros (one conditional
    min-pair aggregation per user); percentiles are TYPE-1 lower
    element picks resolved through the value-grain cumulative device
    (no global row ranking — same shape as qq_compare's pooled
    ladder). Output: (p, latency_us, n_users) with n_users the
    converting-user count.
    """
    per_user = (
        df.where(F.col(type_col).isin([from_type, to_type]))
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.min(
                F.when(
                    F.col(type_col) == from_type, F.unix_micros(F.col(ts_col))
                )
            ).alias("t0")
        )
    )
    # first to_type at/after t0 needs t0 first: re-aggregate with join
    joined = (
        df.where(F.col(type_col) == to_type)
        .select(
            F.col(user_col).alias("u"),
            F.unix_micros(F.col(ts_col)).alias("tp"),
        )
        .join(per_user.where(F.col("t0").isNotNull()), "u")
        .where(F.col("tp") >= F.col("t0"))
        .groupBy("u")
        # t0 is constant within each user's group, so MIN(t0) = t0
        .agg((F.min("tp") - F.min("t0")).cast("bigint").alias("lat"))
    )
    vals = joined.groupBy("lat").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wv = Window.orderBy("lat").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "lat", F.sum("c").over(wv).cast("bigint").alias("cum")
    )
    ntot = joined.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    idx = ntot.select(
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("p"),
        F.col("n"),
    ).select(
        "p",
        (1 + F.expr("((n - 1) * p) div 100")).cast("bigint").alias("idx"),
        F.col("n").alias("n_users"),
    )
    return (
        idx.join(cum, F.col("cum") >= F.col("idx"))
        .groupBy("p", "n_users")
        .agg(F.min("lat").alias("latency_us"))
        .select("p", "latency_us", "n_users")
    )


def conversion_latency_quantiles_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    from_type: str = "click",
    to_type: str = "purchase",
    ps: tuple = (25, 50, 75, 90),
) -> str:
    """DuckDB twin of :func:`conversion_latency_quantiles`."""
    plist = ", ".join(str(p) for p in ps)
    return f"""
    WITH per_user AS (
      SELECT {user_col} AS u,
             MIN(CASE WHEN {type_col} = '{from_type}'
                 THEN epoch_us({ts_col}) END) AS t0
      FROM {table}
      WHERE {type_col} IN ('{from_type}', '{to_type}')
      GROUP BY 1
    ),
    joined AS (
      SELECT e.u, CAST(MIN(e.tp) - MIN(per_user.t0) AS BIGINT) AS lat
      FROM (SELECT {user_col} AS u, epoch_us({ts_col}) AS tp
            FROM {table} WHERE {type_col} = '{to_type}') e
      JOIN per_user ON per_user.u = e.u AND per_user.t0 IS NOT NULL
      WHERE e.tp >= per_user.t0
      GROUP BY e.u
    ),
    vals AS (
      SELECT lat, CAST(COUNT(*) AS BIGINT) AS c FROM joined GROUP BY lat
    ),
    cum AS (
      SELECT lat, CAST(SUM(c) OVER (ORDER BY lat
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
      FROM vals
    ),
    ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM joined),
    idx AS (
      SELECT p, CAST(1 + ((n - 1) * p) // 100 AS BIGINT) AS idx,
             n AS n_users
      FROM ntot CROSS JOIN (SELECT unnest([{plist}]) AS p)
    )
    SELECT idx.p, MIN(cum.lat) AS latency_us, idx.n_users
    FROM idx JOIN cum ON cum.cum >= idx.idx
    GROUP BY idx.p, idx.n_users
    """


def rolling_correlation(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    type_x: str = "click",
    type_y: str = "purchase",
    window_days: int = 14,
) -> DataFrame:
    """Rolling Pearson correlation between two event types' daily
    counts over a trailing ``window_days`` window — the time-LOCAL
    coupling monitor (lagged_cross_correlation gives one global r per
    lag; this shows WHEN the click->purchase relationship decoupled).

    Exactness: daily counts and all five windowed moment sums are
    exact bigints (rolling integer sums over the day-ordered daily
    table); each day's r is one fixed IEEE expression on them — zero
    rounding. Days with degenerate variance emit NULL r. Scale:
    corpus -> day grain once; windows run over the tiny day table.

    Output: (day, n_days_in_window, r).
    """
    daily = (
        df.where(F.col(type_col).isin([type_x, type_y]))
        .groupBy(F.col(ts_col).cast("date").alias("d"))
        .agg(
            F.sum((F.col(type_col) == type_x).cast("long"))
            .cast("bigint")
            .alias("x"),
            F.sum((F.col(type_col) == type_y).cast("long"))
            .cast("bigint")
            .alias("y"),
        )
    )
    w = Window.orderBy("d").rowsBetween(-(window_days - 1), 0)
    winm = daily.select(
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    )
    denx = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    deny = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    return winm.select(
        F.col("d").alias("day"),
        F.col("n").alias("n_days_in_window"),
        F.when(
            (denx > 0) & (deny > 0), num / F.sqrt(denx * deny)
        ).alias("r"),
    )


def rolling_correlation_sql(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
    type_x: str = "click",
    type_y: str = "purchase",
    window_days: int = 14,
) -> str:
    """DuckDB twin of :func:`rolling_correlation`."""
    return f"""
    WITH daily AS (
      SELECT CAST({ts_col} AS DATE) AS d,
             CAST(SUM(CASE WHEN {type_col} = '{type_x}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN {type_col} = '{type_y}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM {table}
      WHERE {type_col} IN ('{type_x}', '{type_y}')
      GROUP BY 1
    ),
    winm AS (
      SELECT d,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
             CAST(SUM(CAST(y AS DECIMAL(20,2)) * y) OVER w AS BIGINT) AS syy
      FROM daily
      WINDOW w AS (ORDER BY d
                   ROWS BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT d AS day, n AS n_days_in_window,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * sx) > 0
                 AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * sy) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * sy)
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * sy))
                END AS r
    FROM winm
    """


def synthetic_control_effect(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    treated: str = "purchase",
    control: str = "signup",
) -> DataFrame:
    """Scaled-control counterfactual (synthetic-control-lite): fit
    the treated/control volume ratio on the FIRST half of the corpus,
    project the control series through it over the second half, and
    read the effect as actual - counterfactual — the "what would have
    happened" baseline when no randomized control exists (the
    placebo expectation on unperturbed data is effect ~ 0).

    Exactness: all four half-totals are exact bigints (integer-micros
    midpoint split); ratio, counterfactual, and effect are single
    IEEE expressions — zero rounding. Output: one row (treated_h1,
    control_h1, treated_h2, control_h2, ratio, counterfactual_h2,
    effect, pct_effect).
    """
    span = df.agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__t0"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__t1"),
    )
    tagged = (
        df.where(F.col(type_col).isin([treated, control]))
        .crossJoin(F.broadcast(span))
        .select(
            (F.col(type_col) == treated).cast("int").alias("tr"),
            (
                F.unix_micros(F.col(ts_col).cast("timestamp")) - F.col("__t0")
                >= F.expr("(__t1 - __t0) div 2")
            ).cast("int").alias("post"),
        )
    )
    agg = tagged.agg(
        F.sum(F.col("tr") * (1 - F.col("post"))).cast("bigint").alias("treated_h1"),
        F.sum((1 - F.col("tr")) * (1 - F.col("post"))).cast("bigint").alias("control_h1"),
        F.sum(F.col("tr") * F.col("post")).cast("bigint").alias("treated_h2"),
        F.sum((1 - F.col("tr")) * F.col("post")).cast("bigint").alias("control_h2"),
    )
    ratio = F.col("treated_h1").cast("double") / F.col("control_h1")
    cf = ratio * F.col("control_h2")
    eff = F.col("treated_h2") - cf
    return agg.select(
        "treated_h1",
        "control_h1",
        "treated_h2",
        "control_h2",
        ratio.alias("ratio"),
        cf.alias("counterfactual_h2"),
        eff.alias("effect"),
        (eff / cf).alias("pct_effect"),
    )


def synthetic_control_effect_sql(
    table: str = "events",
    ts_col: str = "ts",
    type_col: str = "event_type",
    treated: str = "purchase",
    control: str = "signup",
) -> str:
    """DuckDB twin of :func:`synthetic_control_effect`."""
    return f"""
    WITH span AS (
      SELECT epoch_us(MIN({ts_col})) AS t0, epoch_us(MAX({ts_col})) AS t1
      FROM {table}
    ),
    tagged AS (
      SELECT CASE WHEN {type_col} = '{treated}' THEN 1 ELSE 0 END AS tr,
             CASE WHEN epoch_us({ts_col}) - span.t0
                       >= (span.t1 - span.t0) // 2
                  THEN 1 ELSE 0 END AS post
      FROM {table} CROSS JOIN span
      WHERE {type_col} IN ('{treated}', '{control}')
    ),
    agg AS (
      SELECT CAST(SUM(tr * (1 - post)) AS BIGINT) AS treated_h1,
             CAST(SUM((1 - tr) * (1 - post)) AS BIGINT) AS control_h1,
             CAST(SUM(tr * post) AS BIGINT) AS treated_h2,
             CAST(SUM((1 - tr) * post) AS BIGINT) AS control_h2
      FROM tagged
    )
    SELECT treated_h1, control_h1, treated_h2, control_h2,
           CAST(treated_h1 AS DOUBLE) / control_h1 AS ratio,
           CAST(treated_h1 AS DOUBLE) / control_h1 * control_h2
             AS counterfactual_h2,
           treated_h2 - CAST(treated_h1 AS DOUBLE) / control_h1 * control_h2
             AS effect,
           (treated_h2 - CAST(treated_h1 AS DOUBLE) / control_h1
                         * control_h2)
             / (CAST(treated_h1 AS DOUBLE) / control_h1 * control_h2)
             AS pct_effect
    FROM agg
    """


def extreme_value_return_levels(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    horizons: tuple = (30, 90, 365),
) -> DataFrame:
    """Gumbel (EV-I) return levels for daily volume per group: fit by
    method of moments (beta = sd*sqrt(6)/pi, mu = mean -
    0.5772156649*beta) over the daily counts and report the level
    expected to be exceeded once per N days — the capacity-planning
    number ("size for the 1-in-365-day spike") that a plain max
    understates and a mean ignores.

    Exactness: mean/sd derive from exact bigint power sums; each
    return level mu - beta*ln(-ln(1 - 1/N)) is one fixed IEEE
    expression with shared literal constants — identical in both
    engines, zero rounding. Output: (group, horizon_days, mu, beta,
    return_level).
    """
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    mom = daily.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    sd = F.sqrt(F.col("s2").cast("double") / n - mean * mean)
    beta = sd * 2.449489742783178 / 3.141592653589793  # sqrt(6)/pi
    mu = mean - 0.5772156649015329 * beta
    based = mom.select("g", mu.alias("mu"), beta.alias("beta"))
    hz = F.explode(F.array(*[F.lit(h) for h in horizons])).alias("h")
    withh = based.select("g", "mu", "beta", hz)
    rl = F.col("mu") - F.col("beta") * F.log(
        -F.log(1 - 1 / F.col("h").cast("double"))
    )
    return withh.select(
        F.col("g").alias(group_col),
        F.col("h").cast("bigint").alias("horizon_days"),
        "mu",
        "beta",
        rl.alias("return_level"),
    )


def extreme_value_return_levels_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    horizons: tuple = (30, 90, 365),
) -> str:
    """DuckDB twin of :func:`extreme_value_return_levels`."""
    hs = ", ".join(str(h) for h in horizons)
    return f"""
    WITH daily AS (
      SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1, 2
    ),
    mom AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s1,
             CAST(SUM(x * x) AS BIGINT) AS s2
      FROM daily GROUP BY g
    ),
    based AS (
      SELECT g,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
               - 0.5772156649015329
                 * (sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 2.449489742783178 / 3.141592653589793) AS mu,
             sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
               * 2.449489742783178 / 3.141592653589793 AS beta
      FROM mom
    )
    SELECT based.g AS {group_col}, CAST(h AS BIGINT) AS horizon_days,
           based.mu, based.beta,
           based.mu - based.beta * ln(-ln(1 - 1 / CAST(h AS DOUBLE)))
             AS return_level
    FROM based CROSS JOIN (SELECT unnest([{hs}]) AS h)
    """


# --------------------------------------------------------------------------
# periodicity detection: fixed-period DFT power (periodogram lines)
# --------------------------------------------------------------------------

#: double literal of pi shared by the Spark and SQL twins (DuckDB's
#: pi() is the same IEEE double).
_PI = 3.141592653589793


def periodogram_power(
    df: DataFrame,
    ts_col: str,
    periods: Sequence[int],
    round_to: int = 6,
) -> DataFrame:
    """Schuster periodogram lines at candidate ``periods`` (in days)
    over the daily event-count series: for each period P, the power of
    the DFT coefficient at frequency 1/P of the mean-centered series,
    normalized by total variance — the classic seasonality detector
    (weekly traffic -> a spike at P=7).

    power_frac(P) = [ (sum (x_t - xbar) cos(2*pi*t/P))^2
                    + (sum (x_t - xbar) sin(2*pi*t/P))^2 ]
                    / (n/2 * sum (x_t - xbar)^2)

    with t the absolute epoch-day index (a global phase shift only
    rotates the complex coefficient — power is invariant — so no
    min-date scalar pass is needed). The n/2 normalizer makes a pure
    sinusoid at P score ~1.0.

    Scale shape: one groupBy(day) reduces raw events to the daily
    series; the trig projection and the final aggregate run over DAYS
    x PERIODS rows (the series length, not the event count) after one
    tiny mean broadcast. Output: (period_days, power_frac) per period.
    """
    daily = df.groupBy(
        F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    stats = daily.agg(
        F.avg("x").alias("__mu"), F.count(F.lit(1)).cast("double").alias("__n")
    )
    centered = daily.crossJoin(F.broadcast(stats)).select(
        "t", (F.col("x") - F.col("__mu")).alias("xc"), "__n"
    )
    lines = centered.select(
        F.explode(
            F.array(*[F.lit(int(p)).cast("bigint") for p in periods])
        ).alias("period_days"),
        "t",
        "xc",
        "__n",
    )
    ang = 2.0 * _PI * F.col("t").cast("double") / F.col("period_days")
    return (
        lines.groupBy("period_days")
        .agg(
            F.sum(F.col("xc") * F.cos(ang)).alias("__c"),
            F.sum(F.col("xc") * F.sin(ang)).alias("__s"),
            F.sum(F.col("xc") * F.col("xc")).alias("__ss"),
            F.max("__n").alias("__n"),
        )
        .select(
            "period_days",
            F.round(
                (F.col("__c") * F.col("__c") + F.col("__s") * F.col("__s"))
                / (F.col("__n") / 2.0 * F.col("__ss")),
                round_to,
            ).alias("power_frac"),
        )
    )


def periodogram_power_sql(
    table: str, ts_col: str, periods: Sequence[int], round_to: int = 6
) -> str:
    """DuckDB twin of :func:`periodogram_power`."""
    ps = ", ".join(str(int(p)) for p in periods)
    return f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01',
                            CAST({ts_col} AS DATE)) AS BIGINT) AS t,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM {table} GROUP BY 1
    ),
    m AS (SELECT AVG(x) AS mu, CAST(COUNT(*) AS DOUBLE) AS n FROM daily),
    lines AS (
      SELECT p.period_days, daily.t, daily.x - m.mu AS xc, m.n
      FROM daily CROSS JOIN m
      CROSS JOIN (SELECT unnest([{ps}]) AS period_days) p
    )
    SELECT CAST(period_days AS BIGINT) AS period_days,
           ROUND(
             (POW(SUM(xc * cos(2 * pi() * t / period_days)), 2)
              + POW(SUM(xc * sin(2 * pi() * t / period_days)), 2))
             / (MAX(n) / 2.0 * SUM(xc * xc)), {round_to}) AS power_frac
    FROM lines
    GROUP BY period_days
    """


# --------------------------------------------------------------------------
# Bollinger bands: rolling mean +- k sigma breakout days
# --------------------------------------------------------------------------


def bollinger_breakouts(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    k_sigma: float = 2.0,
    round_to: int = 4,
) -> DataFrame:
    """Days whose total ``value_col`` breaks out of the Bollinger band
    mean +- k*stddev of the trailing ``window_days``-row window
    (Bollinger 1992 technical bands, the standard anomaly screen over
    a daily KPI series).

    The band uses the FULL trailing window only (rows 1..w-1 have no
    band — matching every charting implementation) and the sample
    stddev. One groupBy(day) reduces events to the daily series; the
    rolling window then runs over DAYS, a single narrow partition-free
    ordered frame — acceptable because the series is one row per day
    (bounded), never raw events; shard by series key when applying to
    per-entity series.

    Output: breakout days only — (day, value, band_mean, band_std,
    side) with side = 'above' | 'below', rounded for oracle parity.
    """
    daily = df.groupBy(F.col(ts_col).cast("date").alias("day")).agg(
        F.sum(F.col(value_col)).alias("v")
    )
    w = (
        Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    )
    banded = daily.select(
        "day",
        "v",
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("nw"),
    ).filter(F.col("nw") == window_days)
    out = banded.filter(
        (F.col("v") > F.col("mu") + k_sigma * F.col("sd"))
        | (F.col("v") < F.col("mu") - k_sigma * F.col("sd"))
    )
    return out.select(
        "day",
        F.round("v", round_to).alias("value"),
        F.round("mu", round_to).alias("band_mean"),
        F.round("sd", round_to).alias("band_std"),
        F.when(F.col("v") > F.col("mu"), F.lit("above"))
        .otherwise(F.lit("below"))
        .alias("side"),
    )


def bollinger_breakouts_sql(
    table: str,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    k_sigma: float = 2.0,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`bollinger_breakouts`."""
    return f"""
    WITH daily AS (
      SELECT CAST({ts_col} AS DATE) AS day, SUM({value_col}) AS v
      FROM {table} GROUP BY 1
    ),
    banded AS (
      SELECT day, v,
             AVG(v) OVER w AS mu,
             STDDEV_SAMP(v) OVER w AS sd,
             COUNT(*) OVER w AS nw
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           ROUND(v, {round_to}) AS value,
           ROUND(mu, {round_to}) AS band_mean,
           ROUND(sd, {round_to}) AS band_std,
           CASE WHEN v > mu THEN 'above' ELSE 'below' END AS side
    FROM banded
    WHERE nw = {window_days}
      AND (v > mu + {k_sigma} * sd OR v < mu - {k_sigma} * sd)
    """


# --------------------------------------------------------------------------
# RSI (Cutler's SMA form): overbought/oversold screen on a KPI series
# --------------------------------------------------------------------------


def rsi_cutler(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_days: int = 14,
    round_to: int = 4,
) -> DataFrame:
    """Relative Strength Index over the daily total ``value_col``
    series — Cutler's simple-moving-average form (gain/loss SMAs over
    the trailing ``window_days`` deltas), the order-insensitive
    variant: Wilder's original recursive smoothing depends on the
    series start and is not SQL-expressible, Cutler's is a pure
    window aggregate and yields the same signal shape.

    RSI = 100 - 100/(1 + avg_gain/avg_loss); all-loss windows -> 0,
    all-gain windows -> 100 (the conventional limits, emitted
    explicitly so no engine divides by zero). Only FULL windows emit a
    row. One groupBy(day) reduces events to the bounded daily series;
    the lag + frame windows run over days (single series here — shard
    by entity key for per-entity RSI).

    Output: (day, delta, rsi), rounded for oracle parity.
    """
    daily = df.groupBy(F.col(ts_col).cast("date").alias("day")).agg(
        F.sum(F.col(value_col)).alias("v")
    )
    w_ord = Window.orderBy("day")
    delta = (F.col("v") - F.lag("v", 1).over(w_ord)).alias("delta")
    deltas = daily.select("day", delta).filter(F.col("delta").isNotNull())
    w_frame = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    banded = deltas.select(
        "day",
        "delta",
        F.avg(F.greatest(F.col("delta"), F.lit(0.0))).over(w_frame).alias("ag"),
        F.avg(F.greatest(-F.col("delta"), F.lit(0.0))).over(w_frame).alias("al"),
        F.count(F.lit(1)).over(w_frame).alias("nw"),
    ).filter(F.col("nw") == window_days)
    rsi = (
        F.when(F.col("al") == 0.0, F.lit(100.0))
        .when(F.col("ag") == 0.0, F.lit(0.0))
        .otherwise(100.0 - 100.0 / (1.0 + F.col("ag") / F.col("al")))
    )
    return banded.select(
        "day",
        F.round("delta", round_to).alias("delta"),
        F.round(rsi, round_to).alias("rsi"),
    )


def rsi_cutler_sql(
    table: str,
    ts_col: str,
    value_col: str,
    window_days: int = 14,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`rsi_cutler`."""
    return f"""
    WITH daily AS (
      SELECT CAST({ts_col} AS DATE) AS day, SUM({value_col}) AS v
      FROM {table} GROUP BY 1
    ),
    deltas AS (
      SELECT day, v - lag(v, 1) OVER (ORDER BY day) AS delta FROM daily
    ),
    banded AS (
      SELECT day, delta,
             AVG(greatest(delta, 0.0)) OVER w AS ag,
             AVG(greatest(-delta, 0.0)) OVER w AS al,
             COUNT(*) OVER w AS nw
      FROM deltas WHERE delta IS NOT NULL
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {window_days - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           ROUND(delta, {round_to}) AS delta,
           ROUND(CASE WHEN al = 0.0 THEN 100.0
                      WHEN ag = 0.0 THEN 0.0
                      ELSE 100.0 - 100.0 / (1.0 + ag / al) END,
                 {round_to}) AS rsi
    FROM banded
    WHERE nw = {window_days}
    """


def page_hinkley(
    daily: DataFrame,
    series_col: str = "event_type",
    date_col: str = "day",
    value_col: str = "c",
    delta: float = 2.0,
    lam: float = 50.0,
    round_to: int = 6,
) -> DataFrame:
    """Page-Hinkley drift detector per series (Page 1954; the
    sequential mean-shift test ADWIN-style stream monitors descend
    from): for each step t over the daily series,

      ``m_t = sum_{s<=t} (x_s - xbar_s - delta)``  (xbar_s = running
      mean through s), ``PH_t = m_t - min_{s<=t} m_s``, alarm when
      ``PH_t > lambda``.

    A positive drift in the level makes the increments systematically
    exceed the running mean by more than ``delta``, so PH ratchets up;
    ``lambda`` trades detection delay for false alarms. Everything is
    windowed prefix arithmetic over the DAILY aggregate (one row per
    (series, day)), partitioned by series — the raw-event scan reduces
    upstream, so the sequential statistic costs O(days) per series,
    parallel across series, same scale shape as `cusum_changepoint`.

    Output per (series, day): (series, day, x, ph, alarm).
    """
    w_ord = (
        Window.partitionBy(series_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x = F.col(value_col).cast("double")
    staged = daily.withColumn(
        "__term", x - F.avg(x).over(w_ord) - F.lit(float(delta))
    )
    cum = staged.withColumn("__m", F.sum("__term").over(w_ord))
    ph = cum.withColumn("__ph", F.col("__m") - F.min("__m").over(w_ord))
    return ph.select(
        F.col(series_col),
        F.col(date_col),
        F.col(value_col).cast("bigint").alias("x"),
        F.round("__ph", round_to).alias("ph"),
        (F.col("__ph") > F.lit(float(lam))).alias("alarm"),
    ).orderBy(series_col, date_col)


def page_hinkley_sql(
    daily_sql: str,
    series_col: str = "event_type",
    date_col: str = "day",
    value_col: str = "c",
    delta: float = 2.0,
    lam: float = 50.0,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`page_hinkley`; ``daily_sql`` yields the
    (series, day, value) table."""
    return f"""
    WITH d AS ({daily_sql}),
    staged AS (
      SELECT {series_col}, {date_col}, {value_col},
             CAST({value_col} AS DOUBLE)
             - AVG(CAST({value_col} AS DOUBLE)) OVER (
                 PARTITION BY {series_col} ORDER BY {date_col}
                 ROWS UNBOUNDED PRECEDING)
             - {delta!r} AS term
      FROM d
    ),
    cum AS (
      SELECT *, SUM(term) OVER (
               PARTITION BY {series_col} ORDER BY {date_col}
               ROWS UNBOUNDED PRECEDING) AS m
      FROM staged
    ),
    ph AS (
      SELECT *, m - MIN(m) OVER (
               PARTITION BY {series_col} ORDER BY {date_col}
               ROWS UNBOUNDED PRECEDING) AS ph
      FROM cum
    )
    SELECT {series_col}, {date_col},
           CAST({value_col} AS BIGINT) AS x,
           ROUND(ph, {round_to}) AS ph,
           ph > {lam!r} AS alarm
    FROM ph
    ORDER BY {series_col}, {date_col}
    """


def segmented_regression(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    min_seg: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Single-breakpoint segmented (piecewise-linear) regression over
    a daily series: fit separate OLS lines left and right of every
    candidate break k and report the k minimizing total SSE — the
    structural-break fit behind "did the trend change, and when".

    One-pass trick: every candidate split is scored from PREFIX SUMS
    of the six sufficient statistics (n, Σt, Σt², Σy, Σty, Σy²) — the
    right-segment stats are total-minus-prefix, so all n-2*min_seg
    candidate fits come from ONE ordered window pass over the daily
    aggregate plus a broadcast of the 1-row totals; no per-candidate
    rescan, no O(n²) anywhere. Time is the 1..n day INDEX (row
    number), so Σt/Σt² accumulate as exact integers.

    Bit-reproducibility discipline (the ``ppr_fixed_point`` rule,
    graph_metrics.py:1160): the y moments Σy, Σty, Σy² accumulate as
    exact DECIMAL — decimal(18,2) input, products decimal(29,2) /
    decimal(37,4), sums decimal(38,·) — in BOTH the prefix and the
    global window, so their values are independent of partition merge
    order in any engine; doubles appear only inside the closed-form
    ratios, evaluated in identical expression order in Spark and
    DuckDB. (The previous double-sum version flipped the driver hash
    across partition orders — VERDICT r6 #1.) Headroom: Σy² at scale 4
    fits decimal(38,4) up to |y|~1e14 per day, ~1e6× the sf0.1 series.

    SSE of an OLS segment from centered moments:
      ``Stt = Σt² - (Σt)²/n``, ``Sty = Σty - ΣtΣy/n``,
      ``Syy = Σy² - (Σy)²/n``, ``SSE = Syy - Sty²/Stt``,
      ``slope = Sty/Stt``.

    The fit quality is reported DIMENSIONLESS: ``sse_ratio =
    SSE_best / Syy_total`` (= 1 - R² of the piecewise fit), O(1) at
    any data scale — rounding a raw SSE of magnitude ~1e14 to 6
    decimals is below double resolution and was the other half of the
    r6 flap.

    Output (one row): (n_days, break_index, break_day, slope_left,
    slope_right, sse_ratio). Ties break to the earliest k.
    """
    w_ord = Window.orderBy(date_col).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    yd = F.col(value_col).cast("decimal(18,2)")
    idx = daily.select(
        F.col(date_col),
        yd.alias("__y"),
        F.row_number().over(Window.orderBy(date_col)).alias("__t"),
    )
    td = F.col("__t").cast("decimal(10,0)")
    pre = (
        idx.withColumn("__pn", F.col("__t"))
        .withColumn("__pt", F.sum("__t").over(w_ord))
        .withColumn("__pt2", F.sum(F.col("__t") * F.col("__t")).over(w_ord))
        .withColumn("__py", F.sum("__y").over(w_ord))
        .withColumn("__pty", F.sum(td * F.col("__y")).over(w_ord))
        .withColumn("__py2", F.sum(F.col("__y") * F.col("__y")).over(w_ord))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__tt", F.sum("__t").over(w_all))
        .withColumn("__tt2", F.sum(F.col("__t") * F.col("__t")).over(w_all))
        .withColumn("__ty", F.sum("__y").over(w_all))
        .withColumn("__tty", F.sum(td * F.col("__y")).over(w_all))
        .withColumn("__ty2", F.sum(F.col("__y") * F.col("__y")).over(w_all))
    )

    def _sse(n, st, st2, sy, sty, sy2):
        nn = n.cast("double")
        std = st.cast("double")
        stt = st2.cast("double") - std * std / nn
        sty_c = sty.cast("double") - std * sy.cast("double") / nn
        syy = sy2.cast("double") - sy.cast("double") * sy.cast("double") / nn
        return syy - sty_c * sty_c / stt, sty_c / stt

    sse_l, slope_l = _sse(
        F.col("__pn"), F.col("__pt"), F.col("__pt2"),
        F.col("__py"), F.col("__pty"), F.col("__py2"),
    )
    sse_r, slope_r = _sse(
        F.col("__n") - F.col("__pn"),
        F.col("__tt") - F.col("__pt"),
        F.col("__tt2") - F.col("__pt2"),
        F.col("__ty") - F.col("__py"),
        F.col("__tty") - F.col("__pty"),
        F.col("__ty2") - F.col("__py2"),
    )
    nn_all = F.col("__n").cast("double")
    syy_tot = (
        F.col("__ty2").cast("double")
        - F.col("__ty").cast("double") * F.col("__ty").cast("double") / nn_all
    )
    cands = (
        pre.filter(
            (F.col("__pn") >= min_seg)
            & (F.col("__pn") <= F.col("__n") - min_seg)
        )
        .withColumn("__sse", sse_l + sse_r)
        .withColumn("__syy", syy_tot)
        .withColumn("__sl", slope_l)
        .withColumn("__sr", slope_r)
    )
    best = cands.orderBy(F.col("__sse").asc(), F.col("__t").asc()).limit(1)
    return best.select(
        F.col("__n").cast("bigint").alias("n_days"),
        F.col("__t").cast("bigint").alias("break_index"),
        F.col(date_col).alias("break_day"),
        F.round("__sl", round_to).alias("slope_left"),
        F.round("__sr", round_to).alias("slope_right"),
        F.round(F.col("__sse") / F.col("__syy"), round_to).alias("sse_ratio"),
    )


def segmented_regression_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    min_seg: int = 5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`segmented_regression`.

    Mirrors the Spark plan's determinism discipline: the y moments
    accumulate as exact DECIMAL (sums of decimal(18,2) / its exact
    products), so their values match Spark's bit-for-bit regardless of
    either engine's scan or merge order; doubles enter only in the
    closed-form ratios, written in the same expression order as the
    Spark column expressions.
    """

    def _sse(n, st, st2, sy, sty, sy2):
        nn = f"CAST({n} AS DOUBLE)"
        std = f"CAST({st} AS DOUBLE)"
        stt = f"(CAST({st2} AS DOUBLE) - {std} * {std} / {nn})"
        sty_c = f"(CAST({sty} AS DOUBLE) - {std} * CAST({sy} AS DOUBLE) / {nn})"
        syy = (
            f"(CAST({sy2} AS DOUBLE)"
            f" - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE) / {nn})"
        )
        return f"({syy} - {sty_c} * {sty_c} / {stt})", f"({sty_c} / {stt})"

    sse_l, sl = _sse("pn", "pt", "pt2", "py", "pty", "py2")
    sse_r, sr = _sse(
        "(n - pn)", "(tt - pt)", "(tt2 - pt2)",
        "(ty - py)", "(tty - pty)", "(ty2 - py2)",
    )
    syy_tot = (
        "(CAST(ty2 AS DOUBLE)"
        " - CAST(ty AS DOUBLE) * CAST(ty AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    return f"""
    WITH d AS ({daily_sql}),
    idx AS (
      SELECT {date_col},
             CAST({value_col} AS DECIMAL(18,2)) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    pre AS (
      SELECT {date_col}, t,
             t AS pn,
             SUM(t) OVER w AS pt,
             SUM(t * t) OVER w AS pt2,
             CAST(SUM(y) OVER w AS DECIMAL(28,2)) AS py,
             CAST(SUM(CAST(t AS DECIMAL(10,0)) * y) OVER w
                  AS DECIMAL(32,2)) AS pty,
             CAST(SUM(CAST(y AS DECIMAL(20,2)) * y) OVER w AS DECIMAL(36,4)) AS py2,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             SUM(t) OVER () AS tt,
             SUM(t * t) OVER () AS tt2,
             CAST(SUM(y) OVER () AS DECIMAL(28,2)) AS ty,
             CAST(SUM(CAST(t AS DECIMAL(10,0)) * y) OVER ()
                  AS DECIMAL(32,2)) AS tty,
             CAST(SUM(CAST(y AS DECIMAL(20,2)) * y) OVER () AS DECIMAL(36,4)) AS ty2
      FROM idx
      WINDOW w AS (ORDER BY {date_col} ROWS UNBOUNDED PRECEDING)
    ),
    cands AS (
      SELECT *,
        {sse_l} + {sse_r} AS sse,
        {syy_tot} AS syy,
        {sl} AS sl,
        {sr} AS sr
      FROM pre
      WHERE pn >= {min_seg} AND pn <= n - {min_seg}
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(t AS BIGINT) AS break_index,
           {date_col} AS break_day,
           ROUND(sl, {round_to}) AS slope_left,
           ROUND(sr, {round_to}) AS slope_right,
           ROUND(sse / syy, {round_to}) AS sse_ratio
    FROM cands
    ORDER BY sse ASC, t ASC
    LIMIT 1
    """


def haar_energy(
    daily: DataFrame,
    series_col: str = "event_type",
    date_col: str = "day",
    value_col: str = "c",
    levels: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Unnormalized Haar wavelet detail energies per series — the
    multi-resolution complement to `periodogram_event_periods`
    (Fourier sees global periodicity; Haar details localize variance
    to a TIME SCALE: level 1 = day-to-day roughness, level 2 =
    2-day-block roughness, ...).

    Per level the series pairs up in time order: detail
    ``d = x_odd - x_even``, approximation ``a = x_odd + x_even``
    (unnormalized integer Haar — exact BIGINTs on count data; the
    conventional 1/2^l normalization is applied only at output in
    double). Odd tails drop deterministically. Energy_l = sum d².

    Scale shape: the corpus reduces once to the daily aggregate; each
    level is a groupBy on (series, pair-id) over a table that HALVES
    per level — levels cost a geometric series of tiny shuffles,
    parallel across series.

    Output per (series, level): (series, level, n_pairs, energy_raw,
    energy_norm).
    """
    idx = daily.select(
        F.col(series_col).alias("__s"),
        F.col(value_col).cast("bigint").alias("__x"),
        F.row_number()
        .over(Window.partitionBy(series_col).orderBy(date_col))
        .alias("__i"),
    )
    out = None
    cur = idx
    for lvl in range(1, levels + 1):
        paired = cur.groupBy(
            "__s", ((F.col("__i") - 1) / 2).cast("bigint").alias("__p")
        ).agg(
            F.sum(
                F.when(F.col("__i") % 2 == 1, F.col("__x")).otherwise(
                    -F.col("__x")
                )
            ).alias("__d"),
            F.sum("__x").alias("__a"),
            F.count(F.lit(1)).alias("__c"),
        ).filter(F.col("__c") == 2)
        energy = paired.groupBy("__s").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("__d") * F.col("__d")).cast("bigint").alias(
                "energy_raw"
            ),
        ).select(
            F.col("__s").alias(series_col),
            F.lit(lvl).alias("level"),
            "n_pairs",
            "energy_raw",
            F.round(
                F.col("energy_raw").cast("double")
                / F.lit(float(2 ** lvl)),
                round_to,
            ).alias("energy_norm"),
        )
        out = energy if out is None else out.unionAll(energy)
        cur = paired.select(
            "__s", (F.col("__p") + 1).alias("__i"), F.col("__a").alias("__x")
        )
    return out.orderBy(series_col, "level")


def haar_energy_sql(
    daily_sql: str,
    series_col: str = "event_type",
    date_col: str = "day",
    value_col: str = "c",
    levels: int = 3,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`haar_energy` (levels unrolled as chained
    CTEs)."""
    ctes = [
        f"""d0 AS ({daily_sql}),
    idx0 AS (
      SELECT {series_col} AS s, CAST({value_col} AS BIGINT) AS x,
             ROW_NUMBER() OVER (
               PARTITION BY {series_col} ORDER BY {date_col}) AS i
      FROM d0
    )"""
    ]
    energies = []
    for lvl in range(1, levels + 1):
        ctes.append(
            f"""p{lvl} AS (
      SELECT s, (i - 1) // 2 AS p,
             SUM(CASE WHEN i % 2 = 1 THEN x ELSE -x END) AS d,
             SUM(x) AS a, COUNT(*) AS c
      FROM idx{lvl - 1} GROUP BY s, (i - 1) // 2
    ),
    pc{lvl} AS (SELECT * FROM p{lvl} WHERE c = 2),
    idx{lvl} AS (SELECT s, p + 1 AS i, a AS x FROM pc{lvl})"""
        )
        energies.append(
            f"""SELECT s AS {series_col}, {lvl} AS level,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(d * d) AS BIGINT) AS energy_raw,
           ROUND(CAST(SUM(d * d) AS DOUBLE) / {float(2 ** lvl)!r},
                 {round_to}) AS energy_norm
    FROM pc{lvl} GROUP BY s"""
        )
    body = "\n    UNION ALL ".join(energies)
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT * FROM (\n    {body}\n    ) "
        + f"ORDER BY {series_col}, level\n    "
    )


def runs_test(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of a daily series
    around its median: code each day above/below the median (ties to
    the median are dropped, the standard treatment), count RUNS of
    consecutive same-signs, and compare against the expected run
    count under exchangeability:

      ``E[R] = 2 n1 n2 / (n1+n2) + 1``,
      ``Var[R] = 2 n1 n2 (2 n1 n2 - n1 - n2)
                 / ((n1+n2)^2 (n1+n2-1))``.

    Too FEW runs = trending/clustered; too MANY = oscillating. The
    median uses the doubled-median order-statistic trick (exact
    integer 2*median on count data, no float interpolation); signs,
    run boundaries (a lag window over the daily table) and n1/n2 are
    all exact integers — only the final z runs in double.

    Output (one row): (n_days, n_above, n_below, runs, z).
    """
    ranked = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("bigint").alias("__x"),
    ).withColumn("__rn", F.row_number().over(Window.orderBy("__x", "__d")))
    cnt = ranked.agg(F.max("__rn").alias("__n"))
    med2 = (
        ranked.crossJoin(F.broadcast(cnt))
        .filter(
            (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
            | (F.col("__rn") == F.ceil((F.col("__n") + 1) / 2))
        )
        .agg(
            F.when(F.count(F.lit(1)) == 1, F.sum("__x") * 2)
            .otherwise(F.sum("__x"))
            .alias("__m2")
        )
    )
    signed = (
        ranked.crossJoin(F.broadcast(med2))
        .filter(F.col("__x") * 2 != F.col("__m2"))
        .select(
            "__d",
            (F.col("__x") * 2 > F.col("__m2")).cast("int").alias("__s"),
        )
    )
    w_lag = Window.orderBy("__d")
    runs = signed.withColumn(
        "__new", (F.col("__s") != F.lag("__s", 1).over(w_lag)).cast("int")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("__nd"),
        F.sum("__s").cast("bigint").alias("n_above"),
        F.sum(F.lit(1) - F.col("__s")).cast("bigint").alias("n_below"),
        (F.coalesce(F.sum("__new"), F.lit(0)) + 1).cast("bigint").alias(
            "runs"
        ),
    )
    n1, n2 = F.col("n_above").cast("double"), F.col("n_below").cast("double")
    er = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    vr = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    z = (F.col("runs").cast("double") - er) / F.sqrt(vr)
    # degenerate retained series (all days on one side of the median,
    # or empty after tie removal) makes vr = 0/0 -> NaN; emit NULL z
    # like the sibling zero-variance guards (cochrans_q, mann-kendall)
    return runs.select(
        F.col("__nd").alias("n_days"),
        "n_above",
        "n_below",
        "runs",
        F.when(vr > 0, F.round(z, round_to)).alias("z"),
    )


def runs_test_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`runs_test`."""
    return f"""
    WITH d AS ({daily_sql}),
    ranked AS (
      SELECT {date_col} AS dd, CAST({value_col} AS BIGINT) AS x,
             ROW_NUMBER() OVER (ORDER BY CAST({value_col} AS BIGINT),
                                {date_col}) AS rn
      FROM d
    ),
    cnt AS (SELECT MAX(rn) AS n FROM ranked),
    med2 AS (
      SELECT CASE WHEN COUNT(*) = 1 THEN SUM(x) * 2 ELSE SUM(x) END AS m2
      FROM ranked CROSS JOIN cnt
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    ),
    signed AS (
      SELECT dd, CASE WHEN x * 2 > m2 THEN 1 ELSE 0 END AS s
      FROM ranked CROSS JOIN med2
      WHERE x * 2 <> m2
    ),
    r AS (
      SELECT dd, s,
             CASE WHEN s <> LAG(s, 1) OVER (ORDER BY dd)
                  THEN 1 ELSE 0 END AS new
      FROM signed
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(s) AS BIGINT) AS n_above,
             CAST(SUM(1 - s) AS BIGINT) AS n_below,
             CAST(COALESCE(SUM(new), 0) + 1 AS BIGINT) AS runs
      FROM r
    )
    SELECT nd AS n_days, n_above, n_below, runs,
           CASE WHEN n_above >= 1 AND n_below >= 1
                 AND 2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                     - CAST(n_above AS DOUBLE) - CAST(n_below AS DOUBLE) > 0
           THEN
           ROUND((CAST(runs AS DOUBLE)
                  - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                     / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
                     + 1.0))
                 / SQRT(2.0 * CAST(n_above AS DOUBLE)
                        * CAST(n_below AS DOUBLE)
                        * (2.0 * CAST(n_above AS DOUBLE)
                           * CAST(n_below AS DOUBLE)
                           - CAST(n_above AS DOUBLE)
                           - CAST(n_below AS DOUBLE))
                        / ((CAST(n_above AS DOUBLE)
                            + CAST(n_below AS DOUBLE))
                           * (CAST(n_above AS DOUBLE)
                              + CAST(n_below AS DOUBLE))
                           * (CAST(n_above AS DOUBLE)
                              + CAST(n_below AS DOUBLE) - 1.0))),
                 {round_to})
           END AS z
    FROM agg
    """


def seasonal_mann_kendall(
    df: DataFrame,
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984) over
    the daily total-count series, seasons = day-of-week: pairs are
    compared only WITHIN a season, so a strong weekly cycle cannot
    masquerade as (or mask) a monotonic trend — the failure mode of
    plain `mann_kendall_trend` on weekday-patterned data.
    ``S = sum_season S_s``, ``Var = sum_season Var_s`` (seasons
    independent under H0), continuity-corrected z.

    Exactness: identical integer discipline to the plain MK — S and
    every tie-corrected variance numerator are exact bigints; the
    day-pair join runs per season (O((days/7)²) bounded rows).

    Output (one row): (n_days, s_stat, var_s, z).
    """
    daily = df.groupBy(
        F.datediff(
            F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    szn = daily.select(
        (F.col("d") % 7).alias("g"), "d", "x"
    )
    a = szn.select("g", F.col("d").alias("di"), F.col("x").alias("xi"))
    b = szn.select("g", F.col("d").alias("dj"), F.col("x").alias("xj"))
    pairs = a.join(b, "g").where(F.col("di") < F.col("dj"))
    s = pairs.groupBy("g").agg(
        (
            F.sum((F.col("xj") > F.col("xi")).cast("long"))
            - F.sum((F.col("xj") < F.col("xi")).cast("long"))
        ).cast("bigint").alias("__s")
    )
    nd = szn.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    ties = (
        szn.groupBy("g", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
            ).cast("bigint").alias("__tv")
        )
    )
    per = s.join(nd, "g").join(ties, "g").select(
        "__s",
        "__n",
        (
            F.col("__n") * (F.col("__n") - 1) * (2 * F.col("__n") + 5)
            - F.col("__tv")
        ).alias("__vn"),
    )
    agg = per.agg(
        F.sum("__n").cast("bigint").alias("n_days"),
        F.sum("__s").cast("bigint").alias("s_stat"),
        (F.sum("__vn").cast("double") / 18.0).alias("var_s"),
    )
    s_d = F.col("s_stat").cast("double")
    z = F.when(
        F.col("s_stat") > 0, (s_d - 1.0) / F.sqrt(F.col("var_s"))
    ).when(
        F.col("s_stat") < 0, (s_d + 1.0) / F.sqrt(F.col("var_s"))
    ).otherwise(0.0)
    return agg.select(
        "n_days",
        "s_stat",
        F.round("var_s", round_to).alias("var_s"),
        F.round(z, round_to).alias("z"),
    )


def seasonal_mann_kendall_sql(
    table: str = "events",
    ts_col: str = "ts",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`seasonal_mann_kendall`."""
    return f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01',
                            CAST({ts_col} AS DATE)) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM {table} GROUP BY 1
    ),
    szn AS (SELECT d % 7 AS g, d, x FROM daily),
    s AS (
      SELECT a.g,
             CAST(SUM(CASE WHEN b.x > a.x THEN 1 ELSE 0 END)
                  - SUM(CASE WHEN b.x < a.x THEN 1 ELSE 0 END) AS BIGINT)
               AS s
      FROM szn a JOIN szn b ON a.g = b.g AND a.d < b.d
      GROUP BY a.g
    ),
    nd AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM szn GROUP BY g),
    ties AS (
      SELECT g, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tv
      FROM (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS t
            FROM szn GROUP BY g, x)
      GROUP BY g
    ),
    per AS (
      SELECT s.s, nd.n,
             nd.n * (nd.n - 1) * (2 * nd.n + 5) - ties.tv AS vn
      FROM s JOIN nd USING (g) JOIN ties USING (g)
    ),
    agg AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_days,
             CAST(SUM(s) AS BIGINT) AS s_stat,
             CAST(SUM(vn) AS DOUBLE) / 18.0 AS var_s
      FROM per
    )
    SELECT n_days, s_stat,
           ROUND(var_s, {round_to}) AS var_s,
           ROUND(CASE WHEN s_stat > 0
                      THEN (CAST(s_stat AS DOUBLE) - 1.0) / SQRT(var_s)
                      WHEN s_stat < 0
                      THEN (CAST(s_stat AS DOUBLE) + 1.0) / SQRT(var_s)
                      ELSE 0.0 END, {round_to}) AS z
    FROM agg
    """


def ks_exponential_gaps(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """One-sample Kolmogorov-Smirnov goodness-of-fit of the pooled
    per-user interarrival gaps against a fitted exponential — "is
    arrival timing memoryless?", the assumption behind every Poisson
    traffic model downstream (`ks_test_sources` is the two-sample
    sibling; this one tests against a PARAMETRIC null):

      ``D = sup_x max(|F_hi(x) - F(x)|, |F_lo(x) - F(x)|)``,
      ``F(x) = 1 - exp(-x / mean_gap)``

    with F_hi/F_lo the upper/lower ECDF steps (the sup of a step
    function vs a continuous CDF is attained at a step, checking
    both sides of the jump).

    Exactness: gaps are integer MICROSECONDS from per-user lag
    windows (partitioned — fully parallel, no global sort); the
    ECDF comes from integer prefix counts over the distinct-gap
    table; the fitted mean is a ratio of exact integers, so F(x) is
    bit-identical in both engines and the argmax is over identical
    doubles.

    Output (one row): (n_gaps, mean_gap_s, d_stat, d_sqrt_n).
    """
    w_u = Window.partitionBy("__u").orderBy("__tus")
    gaps = (
        df.select(
            F.col(user_col).alias("__u"),
            F.unix_micros(F.col(ts_col)).alias("__tus"),
        )
        .withColumn("__gap", F.col("__tus") - F.lag("__tus", 1).over(w_u))
        .filter(F.col("__gap").isNotNull() & (F.col("__gap") > 0))
        .select(F.col("__gap").cast("bigint").alias("__g"))
    )
    counts = gaps.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    tot = counts.agg(
        F.sum("__c").cast("bigint").alias("__n"),
        F.sum(F.col("__g") * F.col("__c")).cast("bigint").alias("__sg"),
    )
    w_ord = Window.orderBy("__g").rowsBetween(Window.unboundedPreceding, 0)
    pre = counts.withColumn("__hi", F.sum("__c").over(w_ord)).crossJoin(
        F.broadcast(tot)
    )
    nn = F.col("__n").cast("double")
    f_exp = 1.0 - F.exp(
        -F.col("__g").cast("double")
        / (F.col("__sg").cast("double") / F.col("__n").cast("double"))
    )
    d_hi = F.abs(F.col("__hi").cast("double") / nn - f_exp)
    d_lo = F.abs(
        (F.col("__hi") - F.col("__c")).cast("double") / nn - f_exp
    )
    scored = pre.select(
        "__n", "__sg", F.greatest(d_hi, d_lo).alias("__d")
    )
    agg = scored.groupBy("__n", "__sg").agg(F.max("__d").alias("__dmax"))
    return agg.select(
        F.col("__n").alias("n_gaps"),
        F.round(
            F.col("__sg").cast("double") / F.col("__n") / 1000000.0,
            round_to,
        ).alias("mean_gap_s"),
        F.round("__dmax", round_to).alias("d_stat"),
        F.round(
            F.col("__dmax") * F.sqrt(F.col("__n").cast("double")), round_to
        ).alias("d_sqrt_n"),
    )


def ks_exponential_gaps_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ks_exponential_gaps`."""
    return f"""
    WITH g0 AS (
      SELECT {user_col} AS u, epoch_us({ts_col}) AS tus
      FROM {table}
    ),
    gaps AS (
      SELECT CAST(gap AS BIGINT) AS g FROM (
        SELECT tus - LAG(tus, 1) OVER (PARTITION BY u ORDER BY tus)
                 AS gap
        FROM g0
      ) WHERE gap IS NOT NULL AND gap > 0
    ),
    counts AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(g * c) AS BIGINT) AS sg
      FROM counts
    ),
    pre AS (
      SELECT g, c,
             SUM(c) OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS hi,
             tot.n, tot.sg
      FROM counts CROSS JOIN tot
    ),
    scored AS (
      SELECT n, sg,
             GREATEST(
               ABS(CAST(hi AS DOUBLE) / CAST(n AS DOUBLE)
                   - (1.0 - EXP(-CAST(g AS DOUBLE)
                                / (CAST(sg AS DOUBLE)
                                   / CAST(n AS DOUBLE))))),
               ABS(CAST(hi - c AS DOUBLE) / CAST(n AS DOUBLE)
                   - (1.0 - EXP(-CAST(g AS DOUBLE)
                                / (CAST(sg AS DOUBLE)
                                   / CAST(n AS DOUBLE)))))
             ) AS d
      FROM pre
    ),
    agg AS (SELECT n, sg, MAX(d) AS dmax FROM scored GROUP BY n, sg)
    SELECT n AS n_gaps,
           ROUND(CAST(sg AS DOUBLE) / n / 1000000.0, {round_to})
             AS mean_gap_s,
           ROUND(dmax, {round_to}) AS d_stat,
           ROUND(dmax * SQRT(CAST(n AS DOUBLE)), {round_to}) AS d_sqrt_n
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 77: serial-dependence / randomness diagnostics
# ──────────────────────────────────────────────────────────────────────────


def ljung_box(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "c",
    lags: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Ljung-Box portmanteau test over the daily series — "is there
    ANY autocorrelation in the first ``lags`` lags", the multi-lag
    complement to `durbin_watson_trend`'s single lag-1 check (and the
    standard residual-whiteness gate after any forecast fit):

      ``Q = n (n+2) * sum_{l=1..L} r_l^2 / (n - l)``,
      ``r_l = sum_t (x_t - xbar)(x_{t-l} - xbar) / sum_t (x_t - xbar)^2``.

    One ordered window pass builds the L lag columns; one aggregate
    reduces every numerator and the common denominator — the corpus
    reduced to the daily table upstream, so this is O(days * L) with
    no self-joins. The mean enters as an exact ratio of a decimal/int
    sum, so both engines center on bit-identical values.

    Output (one row): (n_days, lags, r1, q_stat).
    """
    pts = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__x"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.avg("__x").alias("__mu"),
    )
    w = Window.orderBy("__d")
    cen = pts.crossJoin(F.broadcast(m)).select(
        "__n", (F.col("__x") - F.col("__mu")).alias("__xc"), "__d"
    )
    lagged = cen.select(
        "__n",
        "__xc",
        *[F.lag("__xc", l).over(w).alias(f"__l{l}") for l in range(1, lags + 1)],
    )
    agg = lagged.agg(
        F.max("__n").alias("n_days"),
        F.sum(F.col("__xc") * F.col("__xc")).alias("__den"),
        *[
            F.coalesce(F.sum(F.col("__xc") * F.col(f"__l{l}")), F.lit(0.0)).alias(
                f"__s{l}"
            )
            for l in range(1, lags + 1)
        ],
    )
    nn = F.col("n_days").cast("double")
    q = None
    for l in range(1, lags + 1):
        r = F.col(f"__s{l}") / F.col("__den")
        term = r * r / (nn - l)
        q = term if q is None else q + term
    q = nn * (nn + 2.0) * q
    return agg.select(
        "n_days",
        F.lit(lags).cast("int").alias("lags"),
        F.round(F.col("__s1") / F.col("__den"), round_to).alias("r1"),
        F.round(q, round_to).alias("q_stat"),
    )


def ljung_box_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "c",
    lags: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ljung_box` (lags unrolled)."""
    lag_cols = ",\n             ".join(
        f"LAG(xc, {l}) OVER (ORDER BY d) AS l{l}" for l in range(1, lags + 1)
    )
    sum_cols = ",\n             ".join(
        f"COALESCE(SUM(xc * l{l}), 0.0) AS s{l}" for l in range(1, lags + 1)
    )
    q_terms = "\n                  + ".join(
        f"(s{l} / den) * (s{l} / den) / (CAST(n AS DOUBLE) - {l})"
        for l in range(1, lags + 1)
    )
    return f"""
    WITH d AS ({daily_sql}),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 AVG(CAST({value_col} AS DOUBLE)) AS mu
          FROM d),
    cen AS (
      SELECT {date_col} AS d, CAST({value_col} AS DOUBLE) - m.mu AS xc, m.n
      FROM d CROSS JOIN m
    ),
    lagged AS (
      SELECT n, xc,
             {lag_cols}
      FROM cen
    ),
    agg AS (
      SELECT MAX(n) AS n_days,
             SUM(xc * xc) AS den,
             {sum_cols}
      FROM lagged
    )
    SELECT n_days AS n_days,
           CAST({lags} AS INTEGER) AS lags,
           ROUND(s1 / den, {round_to}) AS r1,
           ROUND(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0)
                 * ({q_terms}),
                 {round_to}) AS q_stat
    FROM (SELECT n_days AS n, * FROM agg)
    """


def cox_stuart(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> DataFrame:
    """Cox-Stuart sign test for trend: pair each day in the first
    half with its opposite number in the second half (odd middle
    observation drops), count rises vs falls, and z-test the sign
    count against Binomial(n_pairs, 1/2) — the crudest, most
    assumption-free trend check (runs_test asks "random?", this asks
    "drifting?"). Ties (equal pair values) drop, the standard
    treatment. Signs and counts are exact integers; z has no
    continuity correction (documented convention, identical both
    engines).

    Output (one row): (n_days, n_pairs, n_plus, n_minus, z).
    """
    pts = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("bigint").alias("__x"),
    ).withColumn("__t", F.row_number().over(Window.orderBy("__d")))
    n_row = pts.agg(F.max("__t").cast("bigint").alias("__n"))
    # shift h = ceil(n/2); first-half indices 1..n//2 pair with i+h
    a = pts.select(F.col("__t").alias("__i"), F.col("__x").alias("__xa"))
    b = pts.select(F.col("__t").alias("__j"), F.col("__x").alias("__xb"))
    paired = (
        a.crossJoin(F.broadcast(n_row))
        .filter(F.col("__i") <= F.floor(F.col("__n") / 2))
        .join(
            b,
            F.col("__j")
            == F.col("__i") + F.ceil(F.col("__n").cast("double") / 2).cast("bigint"),
        )
    )
    agg = paired.agg(
        F.max("__n").alias("n_days"),
        F.sum((F.col("__xb") > F.col("__xa")).cast("long"))
        .cast("bigint")
        .alias("n_plus"),
        F.sum((F.col("__xb") < F.col("__xa")).cast("long"))
        .cast("bigint")
        .alias("n_minus"),
    )
    np_, nm = F.col("n_plus").cast("double"), F.col("n_minus").cast("double")
    npairs = np_ + nm
    z = F.when(npairs > 0, (np_ - npairs / 2.0) / F.sqrt(npairs / 4.0))
    return agg.select(
        "n_days",
        (F.col("n_plus") + F.col("n_minus")).cast("bigint").alias("n_pairs"),
        "n_plus",
        "n_minus",
        F.round(z, round_to).alias("z"),
    )


def cox_stuart_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cox_stuart`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS BIGINT) AS x,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    n AS (SELECT MAX(t) AS n FROM pts),
    paired AS (
      SELECT a.x AS xa, b.x AS xb, n.n
      FROM pts a CROSS JOIN n
      JOIN pts b ON b.t = a.t + CAST(CEIL(CAST(n.n AS DOUBLE) / 2) AS BIGINT)
      WHERE a.t <= n.n // 2
    ),
    agg AS (
      SELECT MAX(n) AS n_days,
             CAST(SUM(CASE WHEN xb > xa THEN 1 ELSE 0 END) AS BIGINT)
               AS n_plus,
             CAST(SUM(CASE WHEN xb < xa THEN 1 ELSE 0 END) AS BIGINT)
               AS n_minus
      FROM paired
    )
    SELECT n_days,
           CAST(n_plus + n_minus AS BIGINT) AS n_pairs,
           n_plus, n_minus,
           ROUND(CASE WHEN n_plus + n_minus > 0
                 THEN (CAST(n_plus AS DOUBLE)
                       - CAST(n_plus + n_minus AS DOUBLE) / 2.0)
                      / SQRT(CAST(n_plus + n_minus AS DOUBLE) / 4.0)
                 END, {round_to}) AS z
    FROM agg
    """


def turning_points(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> DataFrame:
    """Turning-points randomness test: count interior days that are a
    strict local max or min — ``(x_t - x_{t-1})(x_{t+1} - x_t) < 0``
    (flat steps are NOT turning points; documented tie convention).
    Under iid, ``E[T] = 2(n-2)/3`` and ``Var[T] = (16n - 29)/90``;
    too few turns = trend/persistence, too many = oscillation — the
    second-difference complement to `runs_test` (which ignores
    magnitude order). One lag/lead window over the daily aggregate.

    Output (one row): (n_days, n_turning, expected, z).
    """
    w = Window.orderBy(date_col)
    x = F.col(value_col).cast("bigint")
    marked = daily.select(
        x.alias("__x"),
        F.lag(x, 1).over(w).alias("__p"),
        F.lead(x, 1).over(w).alias("__f"),
    ).withColumn(
        "__turn",
        (
            F.col("__p").isNotNull()
            & F.col("__f").isNotNull()
            & (
                (F.col("__x") - F.col("__p")) * (F.col("__f") - F.col("__x"))
                < 0
            )
        ).cast("long"),
    )
    agg = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__turn").cast("bigint").alias("n_turning"),
    )
    nn = F.col("n_days").cast("double")
    e = 2.0 * (nn - 2.0) / 3.0
    v = (16.0 * nn - 29.0) / 90.0
    z = F.when(
        v > 0, (F.col("n_turning").cast("double") - e) / F.sqrt(v)
    )
    return agg.select(
        "n_days",
        "n_turning",
        F.round(e, round_to).alias("expected"),
        F.round(z, round_to).alias("z"),
    )


def turning_points_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`turning_points`."""
    return f"""
    WITH d AS ({daily_sql}),
    marked AS (
      SELECT CAST({value_col} AS BIGINT) AS x,
             LAG(CAST({value_col} AS BIGINT), 1)
               OVER (ORDER BY {date_col}) AS p,
             LEAD(CAST({value_col} AS BIGINT), 1)
               OVER (ORDER BY {date_col}) AS f
      FROM d
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN p IS NOT NULL AND f IS NOT NULL
                            AND (x - p) * (f - x) < 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
      FROM marked
    )
    SELECT n_days, n_turning,
           ROUND(2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0, {round_to})
             AS expected,
           ROUND(CASE WHEN (16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0 > 0
                 THEN (CAST(n_turning AS DOUBLE)
                       - 2.0 * (CAST(n_days AS DOUBLE) - 2.0) / 3.0)
                      / SQRT((16.0 * CAST(n_days AS DOUBLE) - 29.0) / 90.0)
                 END, {round_to}) AS z
    FROM agg
    """


def variance_ratio(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "c",
    q: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Lo-MacKinlay variance-ratio statistic VR(q) over the daily
    series' first differences — the random-walk diagnostic (VR ~ 1
    under iid increments; > 1 = positive serial dependence /
    trending, < 1 = mean reversion):

      ``VR(q) = Var_q / (q * Var_1)`` with ``Var_1`` the population
      variance of 1-step differences and ``Var_q`` that of the
      OVERLAPPING q-step differences divided by q's worth of steps —
      both centered on the same per-step mean drift
      ``mu = (x_n - x_1)/(n - 1)``.

    Convention (documented; identical in both engines): population
    variances (divide by the difference count, no small-sample or
    overlap bias correction). Two lag windows over the daily table.

    Output (one row): (n_days, q, var_1, var_q, vr).
    """
    w = Window.orderBy(date_col)
    x = F.col(value_col).cast("double")
    pts = daily.select(
        F.col(date_col).alias("__d"),
        x.alias("__x"),
        F.lag(x, 1).over(w).alias("__x1"),
        F.lag(x, int(q)).over(w).alias("__xq"),
        F.first(x).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__first"),
        F.last(x).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__last"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("__n"),
    )
    mu = (F.col("__last") - F.col("__first")) / (
        F.col("__n").cast("double") - 1.0
    )
    r1 = F.col("__x") - F.col("__x1") - mu
    rq = F.col("__x") - F.col("__xq") - F.lit(float(q)) * mu
    agg = pts.agg(
        F.max("__n").cast("bigint").alias("n_days"),
        (
            F.sum(F.when(F.col("__x1").isNotNull(), r1 * r1))
            / F.sum(F.when(F.col("__x1").isNotNull(), 1).cast("double"))
        ).alias("__v1"),
        (
            F.sum(F.when(F.col("__xq").isNotNull(), rq * rq))
            / (
                F.sum(F.when(F.col("__xq").isNotNull(), 1).cast("double"))
                * F.lit(float(q))
            )
        ).alias("__vq"),
    )
    return agg.select(
        "n_days",
        F.lit(int(q)).cast("int").alias("q"),
        F.round("__v1", round_to).alias("var_1"),
        F.round("__vq", round_to).alias("var_q"),
        F.round(
            F.when(F.col("__v1") > 0, F.col("__vq") / F.col("__v1")),
            round_to,
        ).alias("vr"),
    )


def variance_ratio_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "c",
    q: int = 5,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`variance_ratio`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS x,
             LAG(CAST({value_col} AS DOUBLE), 1)
               OVER (ORDER BY {date_col}) AS x1,
             LAG(CAST({value_col} AS DOUBLE), {q})
               OVER (ORDER BY {date_col}) AS xq,
             FIRST_VALUE(CAST({value_col} AS DOUBLE)) OVER (
               ORDER BY {date_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS xf,
             LAST_VALUE(CAST({value_col} AS DOUBLE)) OVER (
               ORDER BY {date_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
             ) AS xl,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM d
    ),
    agg AS (
      SELECT MAX(n) AS n_days,
             SUM(CASE WHEN x1 IS NOT NULL
                 THEN (x - x1 - (xl - xf) / (CAST(n AS DOUBLE) - 1.0))
                    * (x - x1 - (xl - xf) / (CAST(n AS DOUBLE) - 1.0)) END)
             / SUM(CASE WHEN x1 IS NOT NULL THEN 1 END) AS v1,
             SUM(CASE WHEN xq IS NOT NULL
                 THEN (x - xq - CAST({q} AS DOUBLE)
                               * (xl - xf) / (CAST(n AS DOUBLE) - 1.0))
                    * (x - xq - CAST({q} AS DOUBLE)
                               * (xl - xf) / (CAST(n AS DOUBLE) - 1.0)) END)
             / (SUM(CASE WHEN xq IS NOT NULL THEN 1 END)
                * CAST({q} AS DOUBLE)) AS vq
      FROM pts
    )
    SELECT n_days,
           CAST({q} AS INTEGER) AS q,
           ROUND(v1, {round_to}) AS var_1,
           ROUND(vq, {round_to}) AS var_q,
           ROUND(CASE WHEN v1 > 0 THEN vq / v1 END, {round_to}) AS vr
    FROM agg
    """


def pacf3(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> DataFrame:
    """Partial autocorrelations at lags 1-3 via the Durbin-Levinson
    recursion — "which lags matter DIRECTLY?": the ACF
    (autocorrelation_report, ljung_box) confounds lag-2 dependence
    with lag-1-applied-twice; the PACF removes the shorter-lag
    pass-through, which is what actually picks an AR order.

      ``φ11 = r1``;  ``φ22 = (r2 - r1²)/(1 - r1²)``;
      ``φ21 = φ11 - φ22·φ11``;
      ``φ33 = (r3 - φ21 r2 - φ22 r1)/(1 - φ21 r1 - φ22 r2)``.

    The r_l use the standard biased estimator over the mean-centered
    series (same convention as :func:`ljung_box`): one ordered-window
    lag pass, one aggregate, then pure scalar arithmetic — O(days),
    identical expression order in both engines.

    Output (one row): (n_days, r1, r2, r3, pacf2, pacf3).
    """
    pts = daily.select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__x"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.avg("__x").alias("__mu"),
    )
    w = Window.orderBy("__d")
    cen = pts.crossJoin(F.broadcast(m)).select(
        "__n", (F.col("__x") - F.col("__mu")).alias("__xc"), "__d"
    )
    lagged = cen.select(
        "__n",
        "__xc",
        *[F.lag("__xc", l).over(w).alias(f"__l{l}") for l in (1, 2, 3)],
    )
    agg = lagged.agg(
        F.max("__n").alias("n_days"),
        F.sum(F.col("__xc") * F.col("__xc")).alias("__den"),
        *[
            F.coalesce(F.sum(F.col("__xc") * F.col(f"__l{l}")), F.lit(0.0)).alias(
                f"__s{l}"
            )
            for l in (1, 2, 3)
        ],
    )
    rs = agg.select(
        "n_days",
        (F.col("__s1") / F.col("__den")).alias("r1"),
        (F.col("__s2") / F.col("__den")).alias("r2"),
        (F.col("__s3") / F.col("__den")).alias("r3"),
    )
    p2 = rs.select(
        "n_days",
        "r1",
        "r2",
        "r3",
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (F.lit(1.0) - F.col("r1") * F.col("r1"))
        ).alias("p2"),
    )
    p21 = p2.select(
        "n_days",
        "r1",
        "r2",
        "r3",
        "p2",
        (F.col("r1") - F.col("p2") * F.col("r1")).alias("p21"),
    )
    p3 = (
        F.col("r3") - F.col("p21") * F.col("r2") - F.col("p2") * F.col("r1")
    ) / (
        F.lit(1.0) - F.col("p21") * F.col("r1") - F.col("p2") * F.col("r2")
    )
    return p21.select(
        "n_days",
        F.round("r1", round_to).alias("r1"),
        F.round("r2", round_to).alias("r2"),
        F.round("r3", round_to).alias("r3"),
        F.round("p2", round_to).alias("pacf2"),
        F.round(p3, round_to).alias("pacf3"),
    )


def pacf3_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "c",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`pacf3`."""
    return f"""
    WITH d AS ({daily_sql}),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 AVG(CAST({value_col} AS DOUBLE)) AS mu
          FROM d),
    cen AS (
      SELECT {date_col} AS dd, CAST({value_col} AS DOUBLE) - m.mu AS xc, m.n
      FROM d CROSS JOIN m
    ),
    lagged AS (
      SELECT n, xc,
             LAG(xc, 1) OVER (ORDER BY dd) AS l1,
             LAG(xc, 2) OVER (ORDER BY dd) AS l2,
             LAG(xc, 3) OVER (ORDER BY dd) AS l3
      FROM cen
    ),
    agg AS (
      SELECT MAX(n) AS n_days,
             SUM(xc * xc) AS den,
             COALESCE(SUM(xc * l1), 0.0) AS s1,
             COALESCE(SUM(xc * l2), 0.0) AS s2,
             COALESCE(SUM(xc * l3), 0.0) AS s3
      FROM lagged
    ),
    rs AS (
      SELECT n_days, s1 / den AS r1, s2 / den AS r2, s3 / den AS r3
      FROM agg
    ),
    p2t AS (
      SELECT n_days, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS p2
      FROM rs
    ),
    p21t AS (
      SELECT n_days, r1, r2, r3, p2, r1 - p2 * r1 AS p21
      FROM p2t
    )
    SELECT n_days,
           ROUND(r1, {round_to}) AS r1,
           ROUND(r2, {round_to}) AS r2,
           ROUND(r3, {round_to}) AS r3,
           ROUND(p2, {round_to}) AS pacf2,
           ROUND((r3 - p21 * r2 - p2 * r1)
                 / (1.0 - p21 * r1 - p2 * r2),
                 {round_to}) AS pacf3
    FROM p21t
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 88: matrix profile (exact, bounded kernel)
# ──────────────────────────────────────────────────────────────────────────


def matrix_profile(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    m: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Exact matrix profile of the daily series (Yeh et al. 2016): for
    every length-``m`` subsequence, the z-normalized Euclidean distance
    to its nearest non-trivial neighbor —
    ``d(i,j) = sqrt(2m(1 - ρ(S_i, S_j)))`` minimized over
    ``|i - j| > m/2``. Low profile values mark MOTIFS (repeated
    shapes), the maximum marks the top DISCORD (the series' most
    anomalous week) — the shape-mining primitive a plain z-score scan
    cannot give.

    Shape: the series is first densified to t = 1..n by ROW_NUMBER
    (calendar gaps become index-adjacent, noted in the output contract);
    subsequence moments come from one windowed pass; the cross-dot is
    decomposed ALONG DIAGONALS (the STOMP/SCRIMP layout, Zhu et al.
    2016): on diagonal δ = j − i the dot is a sliding sum of the
    element products z_t = y_t·y_{t+δ}, so the O(n²) pair table is
    built from broadcast joins of the tiny point table (never a
    skewed offset-key self-join — the m-key equi-join form had only m
    distinct join keys, capping parallelism at m tasks) and one
    window per diagonal; n ≈ days, the bounded-kernel discipline as
    newey_west_trend. Never point this at a raw fact table; roll up
    first. The per-i argmin is a map-side-partial ``min(struct(d,j))``
    — ties break to the smallest j exactly as before (exact ties
    arise from genuinely identical windows, where any j is equally
    correct).

    Output per subsequence: (i, nn_index, profile_dist), ordered by i.
    """
    pts = daily.select(
        F.col(date_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("double").alias("__y"),
    ).withColumn(
        "__t", F.row_number().over(Window.orderBy("__d")).cast("bigint")
    )
    n_total = pts.groupBy().agg(F.max("__t").alias("__n"))
    # diagonals δ with |i-j| = δ > m//2 and at least one valid pair
    deltas = n_total.select(
        F.explode(
            F.when(
                F.col("__n") - m >= m // 2 + 1,
                F.sequence(F.lit(m // 2 + 1), F.col("__n") - m),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("__dlt"),
        F.col("__n"),
    )
    # element products along each diagonal: z_t = y_t * y_{t+δ}
    right = pts.select(
        F.col("__t").alias("__t2"), F.col("__y").alias("__y2")
    )
    # the nested-loop pairing below streams `pts`, which sits in ONE
    # partition (tiny rollup) — fan it out so the O(n²) pair build and
    # the element products run cluster-wide
    el = (
        fan_out(pts)
        .join(F.broadcast(deltas), F.col("__t") <= F.col("__n") - F.col("__dlt"))
        .join(
            F.broadcast(right),
            F.col("__t2") == F.col("__t") + F.col("__dlt"),
        )
        .select(
            "__dlt",
            "__n",
            F.col("__t").alias("i"),
            (F.col("__y") * F.col("__y2")).alias("__z"),
        )
    )
    wdiag = (
        Window.partitionBy("__dlt")
        .orderBy("i")
        .rowsBetween(Window.currentRow, m - 1)
    )
    dots = el.select(
        "__dlt",
        "i",
        F.sum("__z").over(wdiag).alias("dot"),
        F.col("__n"),
    ).filter(F.col("i") <= F.col("__n") - m + 1 - F.col("__dlt"))
    md = float(m)
    mom = pts.select(
        F.col("__t").alias("i"), "__y"
    ).withColumn(
        "s",
        F.sum("__y").over(
            Window.orderBy("i").rowsBetween(Window.currentRow, m - 1)
        ),
    ).withColumn(
        "ss",
        F.sum(F.col("__y") * F.col("__y")).over(
            Window.orderBy("i").rowsBetween(Window.currentRow, m - 1)
        ),
    ).crossJoin(F.broadcast(n_total)).filter(
        F.col("i") <= F.col("__n") - m + 1
    ).select("i", "s", "ss")
    # both directions of each diagonal pair: (i, j) and (j, i) — one
    # explode, so the dots chain is computed once, not per union branch
    pairs = dots.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("i").alias("i"),
                    (F.col("i") + F.col("__dlt")).alias("j"),
                ),
                F.struct(
                    (F.col("i") + F.col("__dlt")).alias("i"),
                    F.col("i").alias("j"),
                ),
            )
        ).alias("__p"),
        "dot",
    ).select(F.col("__p.i").alias("i"), F.col("__p.j").alias("j"), "dot")
    j = (
        pairs.join(
            F.broadcast(
                mom.select(
                    F.col("i"),
                    F.col("s").alias("sa"),
                    F.col("ss").alias("ssa"),
                )
            ),
            "i",
        )
        .join(
            F.broadcast(
                mom.select(
                    F.col("i").alias("j"),
                    F.col("s").alias("sb"),
                    F.col("ss").alias("ssb"),
                )
            ),
            "j",
        )
    )
    var_a = F.col("ssa") - F.col("sa") * F.col("sa") / md
    var_b = F.col("ssb") - F.col("sb") * F.col("sb") / md
    cov = F.col("dot") - F.col("sa") * F.col("sb") / md
    rho = cov / F.sqrt(var_a * var_b)
    dist = F.sqrt(
        F.greatest(F.lit(0.0), F.lit(2.0 * md) * (F.lit(1.0) - rho))
    )
    scored = j.select(F.col("i"), F.col("j"), dist.alias("d"))
    best = (
        scored.groupBy("i")
        .agg(F.min(F.struct(F.col("d"), F.col("j"))).alias("__b"))
        .select(
            "i",
            F.col("__b.j").alias("nn_index"),
            F.round(F.col("__b.d"), round_to).alias("profile_dist"),
        )
    )
    return best.orderBy("i")


def matrix_profile_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    m: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`matrix_profile` (identical formula order)."""
    offs = ", ".join(f"({k})" for k in range(m))
    return f"""
    WITH d0 AS ({daily_sql}),
    pts AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t,
             CAST({value_col} AS DOUBLE) AS y
      FROM d0
    ),
    n_row AS (SELECT MAX(t) AS n FROM pts),
    el AS (
      SELECT pts.t - k.k AS i, k.k AS k, pts.y
      FROM pts CROSS JOIN (VALUES {offs}) AS k(k)
      CROSS JOIN n_row
      WHERE pts.t - k.k >= 1 AND pts.t - k.k <= n_row.n - {m} + 1
    ),
    mom AS (
      SELECT i, SUM(y) AS s, SUM(y * y) AS ss FROM el GROUP BY i
    ),
    dots AS (
      SELECT a.i AS ia, b.i AS jb, SUM(a.y * b.y) AS dot
      FROM el a JOIN el b ON a.k = b.k
      WHERE ABS(a.i - b.i) > {m // 2}
      GROUP BY a.i, b.i
    ),
    scored AS (
      SELECT ia AS i, jb AS j,
             SQRT(GREATEST(0.0,
               {2.0 * m!r} * (1.0 -
                 (dot - ma.s * mb.s / {float(m)!r})
                 / SQRT((ma.ss - ma.s * ma.s / {float(m)!r})
                        * (mb.ss - mb.s * mb.s / {float(m)!r}))))) AS d
      FROM dots
      JOIN mom ma ON dots.ia = ma.i
      JOIN mom mb ON dots.jb = mb.i
    ),
    best AS (
      SELECT i, j, d,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY d ASC, j ASC)
               AS rn
      FROM scored
    )
    SELECT i, j AS nn_index, ROUND(d, {round_to}) AS profile_dist
    FROM best WHERE rn = 1
    ORDER BY i
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 90: generalized Pareto tail fit (peaks over threshold)
# ──────────────────────────────────────────────────────────────────────────


def gpd_tail_fit(
    df: DataFrame,
    value_col: str,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    """Peaks-over-threshold tail model: exceedances ``e = x - u`` over
    the fixed threshold ``u`` fitted to a Generalized Pareto by the
    method of moments —

      ξ̂ = (1 - m²/s²) / 2,   σ̂ = m · (m²/s² + 1) / 2

    (m, s² the exceedance mean/variance; Hosking & Wallis 1987). The
    EVT complement to block-maxima return levels
    (extreme_value_return_levels): POT uses every tail observation,
    not one per block, so the tail index stabilizes on far less data.
    Plus the conditional tail expectation at 2u implied by the fit.
    One scan-stage aggregate; the threshold is a pinned literal (at
    scale you would read it off a KLL quantile sketch first).

    Output (one row): n_exceedances, mean_excess, xi_hat, sigma_hat,
    tail_expect_2u (NULL when ξ ≥ 1, where the mean is infinite)."""
    e = F.when(
        F.col(value_col).cast("double") > threshold,
        F.col(value_col).cast("double") - threshold,
    )
    m = df.agg(
        F.count(e).cast("bigint").alias("n"),
        F.sum(e).alias("s1"),
        F.sum(e * e).alias("s2"),
    )
    nn = F.col("n").cast("double")
    mean = F.col("s1") / nn
    var = (F.col("s2") - F.col("s1") * F.col("s1") / nn) / (nn - 1.0)
    ratio = mean * mean / var
    xi = (F.lit(1.0) - ratio) / 2.0
    sigma = mean * (ratio + 1.0) / 2.0
    # E[X - 2u | X > 2u] = (sigma + xi*u) / (1 - xi) for xi < 1
    tail2u = F.when(
        xi < 1.0, (sigma + xi * F.lit(float(threshold))) / (F.lit(1.0) - xi)
    )
    return m.select(
        F.col("n").alias("n_exceedances"),
        F.round(mean, round_to).alias("mean_excess"),
        F.round(xi, round_to).alias("xi_hat"),
        F.round(sigma, round_to).alias("sigma_hat"),
        F.round(tail2u, round_to).alias("tail_expect_2u"),
    )


def gpd_tail_fit_sql(
    table: str, value_col: str, threshold: float, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`gpd_tail_fit`."""
    u = float(threshold)
    e = (
        f"CASE WHEN CAST({value_col} AS DOUBLE) > {u!r} "
        f"THEN CAST({value_col} AS DOUBLE) - {u!r} END"
    )
    return f"""
    WITH m AS (
      SELECT CAST(COUNT({e}) AS BIGINT) AS n,
             SUM({e}) AS s1, SUM(({e}) * ({e})) AS s2
      FROM {table}
    ),
    d AS (
      SELECT n,
             s1 / CAST(n AS DOUBLE) AS mean,
             (s2 - s1 * s1 / CAST(n AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0) AS var
      FROM m
    ),
    f AS (
      SELECT n, mean,
             (1.0 - mean * mean / var) / 2.0 AS xi,
             mean * (mean * mean / var + 1.0) / 2.0 AS sigma
      FROM d
    )
    SELECT n AS n_exceedances,
           ROUND(mean, {round_to}) AS mean_excess,
           ROUND(xi, {round_to}) AS xi_hat,
           ROUND(sigma, {round_to}) AS sigma_hat,
           ROUND(CASE WHEN xi < 1.0
                      THEN (sigma + xi * {u!r}) / (1.0 - xi) END,
                 {round_to}) AS tail_expect_2u
    FROM f
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 98: forecast accuracy battery + Diebold-Mariano
# ──────────────────────────────────────────────────────────────────────────


def _w98_scored(
    df: DataFrame, ts_col: str, key_col: str, season_days: int
) -> DataFrame:
    """Daily per-key counts joined with their lag-1 (naive forecast)
    and lag-``season_days`` (seasonal-naive forecast) actuals; only
    days where all three exist are scored — the same no-zero-fill
    discipline as seasonal_naive_backtest above."""
    daily = df.groupBy(
        F.col(key_col).alias("k"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    f_n = daily.select(
        "k", F.date_add("d", 1).alias("d"), F.col("a").alias("fn")
    )
    f_s = daily.select(
        "k",
        F.date_add("d", season_days).alias("d"),
        F.col("a").alias("fs"),
    )
    return daily.join(f_n, ["k", "d"]).join(f_s, ["k", "d"])


def forecast_accuracy_battery(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    season_days: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """The three scale-free forecast-accuracy metrics the WAPE/bias/
    RMSE trio of seasonal_naive_backtest doesn't give, for the
    seasonal-naive forecaster per key:

    * MASE (evaluation-window form) = MAE(seasonal)/MAE(naive) over
      the same scored days — < 1 means the seasonality is worth
      having; both MAEs are exact bigint sums, one division.
    * sMAPE = mean of 2|a−f|/(a+f) — the symmetric percentage error
      (a, f are counts ≥ 1, so the denominator never vanishes).
    * Theil's U2 in its RMSE-ratio form = RMSE(seasonal)/RMSE(naive)
      — exact bigint sums of squares, one sqrt of a ratio.

    Scored days need actual, lag-1 and lag-season actuals present
    (two self-joins of the days-sized rollup). Output per key:
    (key, n_days, mase, smape, theil_u2), key-ordered."""
    scored = _w98_scored(df, ts_col, key_col, season_days)
    g = scored.groupBy(F.col("k").alias(key_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.abs(F.col("a") - F.col("fs"))).cast("bigint").alias("sae_s"),
        F.sum(F.abs(F.col("a") - F.col("fn"))).cast("bigint").alias("sae_n"),
        F.sum(
            (F.col("a") - F.col("fs")) * (F.col("a") - F.col("fs"))
        ).cast("bigint").alias("sse_s"),
        F.sum(
            (F.col("a") - F.col("fn")) * (F.col("a") - F.col("fn"))
        ).cast("bigint").alias("sse_n"),
        F.sum(
            F.lit(2.0)
            * F.abs(F.col("a") - F.col("fs")).cast("double")
            / (F.col("a") + F.col("fs")).cast("double")
        ).alias("smape_sum"),
    )
    return g.select(
        key_col,
        "n_days",
        F.round(
            F.col("sae_s").cast("double") / F.col("sae_n").cast("double"),
            round_to,
        ).alias("mase"),
        F.round(
            F.col("smape_sum") / F.col("n_days").cast("double"), round_to
        ).alias("smape"),
        F.round(
            F.sqrt(
                F.col("sse_s").cast("double") / F.col("sse_n").cast("double")
            ),
            round_to,
        ).alias("theil_u2"),
    ).orderBy(key_col)


def forecast_accuracy_battery_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    season_days: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`forecast_accuracy_battery`."""
    return f"""
    WITH daily AS (
      SELECT {key_col} AS k, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS a
      FROM {table} GROUP BY 1, 2
    ),
    scored AS (
      SELECT x.k, x.a, n.a AS fn, s.a AS fs
      FROM daily x
      JOIN daily n ON n.k = x.k AND n.d = x.d - 1
      JOIN daily s ON s.k = x.k AND s.d = x.d - {season_days}
    ),
    g AS (
      SELECT k AS {key_col},
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(ABS(a - fs)) AS BIGINT) AS sae_s,
             CAST(SUM(ABS(a - fn)) AS BIGINT) AS sae_n,
             CAST(SUM((a - fs) * (a - fs)) AS BIGINT) AS sse_s,
             CAST(SUM((a - fn) * (a - fn)) AS BIGINT) AS sse_n,
             SUM(2.0 * CAST(ABS(a - fs) AS DOUBLE)
                 / CAST(a + fs AS DOUBLE)) AS smape_sum
      FROM scored GROUP BY 1
    )
    SELECT {key_col}, n_days,
           ROUND(CAST(sae_s AS DOUBLE) / CAST(sae_n AS DOUBLE),
                 {round_to}) AS mase,
           ROUND(smape_sum / CAST(n_days AS DOUBLE), {round_to}) AS smape,
           ROUND(SQRT(CAST(sse_s AS DOUBLE) / CAST(sse_n AS DOUBLE)),
                 {round_to}) AS theil_u2
    FROM g ORDER BY {key_col}
    """


def diebold_mariano(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    season_days: int = 7,
    nw_lags: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """Diebold-Mariano test per key: is the seasonal-naive forecast
    SIGNIFICANTLY better than the naive one, or just luckier on this
    sample? Loss differential d_t = (a−f_seasonal)² − (a−f_naive)²
    (exact bigint per day, negative favors seasonal); DM = d̄ /
    √(ŝ/n) with ŝ the Newey-West long-run variance (Bartlett weights
    w_l = 1 − l/(L+1), L = ``nw_lags``) — the autocorrelation in
    overlapping forecast errors is exactly why a plain t-test is
    invalid here. Autocovariances run over the observed-day sequence
    (LEAD over the date order per key); if ŝ degenerates to ≤ 0 the
    stat is NULL rather than a fabricated number.

    Two O(days) passes: exact per-key means, then demeaned lag
    products. Output per key: (key, n_days, mean_loss_diff, dm_stat),
    key-ordered."""
    scored = _w98_scored(df, ts_col, key_col, season_days)
    base = scored.select(
        "k",
        "d",
        (
            (F.col("a") - F.col("fs")) * (F.col("a") - F.col("fs"))
            - (F.col("a") - F.col("fn")) * (F.col("a") - F.col("fn"))
        )
        .cast("bigint")
        .alias("dt"),
    )
    means = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dt").cast("bigint").alias("sd"),
    )
    demeaned = base.join(F.broadcast(means), "k").select(
        "k",
        "d",
        "n",
        (F.col("sd").cast("double") / F.col("n").cast("double")).alias("m"),
        (
            F.col("dt").cast("double")
            - F.col("sd").cast("double") / F.col("n").cast("double")
        ).alias("e"),
    )
    w = Window.partitionBy("k").orderBy("d")
    lead_cols = [
        (F.col("e") * F.lead("e", lag).over(w)).alias(f"p{lag}")
        for lag in range(1, nw_lags + 1)
    ]
    rows = demeaned.select("k", "n", "m", (F.col("e") * F.col("e")).alias("p0"), *lead_cols)
    aggs = [F.sum("p0").alias("g0")] + [
        F.sum(F.coalesce(F.col(f"p{lag}"), F.lit(0.0))).alias(f"g{lag}")
        for lag in range(1, nw_lags + 1)
    ]
    g = rows.groupBy(F.col("k").alias(key_col)).agg(
        F.max("n").alias("n_days"), F.max("m").alias("m"), *aggs
    )
    nn = F.col("n_days").cast("double")
    s = F.col("g0") / nn
    for lag in range(1, nw_lags + 1):
        wgt = 1.0 - lag / (nw_lags + 1.0)
        s = s + F.lit(2.0 * wgt) * F.col(f"g{lag}") / nn
    dm = F.when(s > 0, F.col("m") / F.sqrt(s / nn)).otherwise(
        F.lit(None).cast("double")
    )
    return g.select(
        key_col,
        "n_days",
        F.round(F.col("m"), round_to).alias("mean_loss_diff"),
        F.round(dm, round_to).alias("dm_stat"),
    ).orderBy(key_col)


def diebold_mariano_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    season_days: int = 7,
    nw_lags: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`diebold_mariano`."""
    lead_sel = ",\n             ".join(
        f"e * LEAD(e, {lag}) OVER (PARTITION BY k ORDER BY d) AS p{lag}"
        for lag in range(1, nw_lags + 1)
    )
    lead_agg = ",\n             ".join(
        f"SUM(COALESCE(p{lag}, 0.0)) AS g{lag}"
        for lag in range(1, nw_lags + 1)
    )
    s_expr = "g0 / CAST(n_days AS DOUBLE)"
    for lag in range(1, nw_lags + 1):
        wgt = 2.0 * (1.0 - lag / (nw_lags + 1.0))
        s_expr += f" + {wgt!r} * g{lag} / CAST(n_days AS DOUBLE)"
    return f"""
    WITH daily AS (
      SELECT {key_col} AS k, CAST({ts_col} AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS a
      FROM {table} GROUP BY 1, 2
    ),
    scored AS (
      SELECT x.k, x.d, x.a, n.a AS fn, s.a AS fs
      FROM daily x
      JOIN daily n ON n.k = x.k AND n.d = x.d - 1
      JOIN daily s ON s.k = x.k AND s.d = x.d - {season_days}
    ),
    base AS (
      SELECT k, d,
             CAST((a - fs) * (a - fs) - (a - fn) * (a - fn) AS BIGINT)
               AS dt
      FROM scored
    ),
    means AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dt) AS BIGINT) AS sd
      FROM base GROUP BY k
    ),
    demeaned AS (
      SELECT b.k, b.d, m.n,
             CAST(m.sd AS DOUBLE) / CAST(m.n AS DOUBLE) AS m,
             CAST(b.dt AS DOUBLE)
               - CAST(m.sd AS DOUBLE) / CAST(m.n AS DOUBLE) AS e
      FROM base b JOIN means m ON m.k = b.k
    ),
    rows_ AS (
      SELECT k, n, m, e * e AS p0,
             {lead_sel}
      FROM demeaned
    ),
    g AS (
      SELECT k AS {key_col}, MAX(n) AS n_days, MAX(m) AS m,
             SUM(p0) AS g0,
             {lead_agg}
      FROM rows_ GROUP BY 1
    )
    SELECT {key_col}, n_days,
           ROUND(m, {round_to}) AS mean_loss_diff,
           ROUND(CASE WHEN ({s_expr}) > 0
                      THEN m / SQRT(({s_expr})
                                    / CAST(n_days AS DOUBLE))
                      ELSE NULL END,
                 {round_to}) AS dm_stat
    FROM g ORDER BY {key_col}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 100: complexity — sample entropy + permutation entropy
# ──────────────────────────────────────────────────────────────────────────


def sample_entropy(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    r_frac: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Sample entropy SampEn(m=2, r=``r_frac``·SD) of the ordered
    series: −ln(A/B) where B counts template pairs of length 2 and A
    of length 3 that match within Chebyshev tolerance r (self-matches
    excluded) — the regularity measure behind physiological and
    anomaly work (Richman & Moorman 2000): low SampEn = repetitive
    dynamics, high = irregularity. Complements hurst_rs (memory) and
    spectral_entropy (frequency spread) with time-domain determinism.

    The pair stage is the bounded daily-rollup self-join (n = days,
    never rows — matrix_profile discipline); r derives from exact
    moments so both engines compare against the identical double, and
    matching is pure comparison counting (exact bigints) with one
    closing log. Output (one row): n_days, r_tol, b_count, a_count,
    sampen."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    w = Window.orderBy("__t")
    tmpl = pts.select(
        "__t",
        F.col("__y").alias("__v0"),
        F.lead("__y", 1).over(w).alias("__v1"),
        F.lead("__y", 2).over(w).alias("__v2"),
    ).filter(F.col("__v2").isNotNull())
    stats = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    ).select(
        "n_days",
        (
            F.lit(r_frac)
            * F.sqrt(
                F.col("syy") / F.col("n_days").cast("double")
                - (F.col("sy") / F.col("n_days").cast("double"))
                * (F.col("sy") / F.col("n_days").cast("double"))
            )
        ).alias("r_tol"),
    )
    a = tmpl.select(
        F.col("__t").alias("__ta"),
        F.col("__v0").alias("__a0"),
        F.col("__v1").alias("__a1"),
        F.col("__v2").alias("__a2"),
    )
    b = tmpl.select(
        F.col("__t").alias("__tb"),
        F.col("__v0").alias("__b0"),
        F.col("__v1").alias("__b1"),
        F.col("__v2").alias("__b2"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("__ta") < F.col("__tb"))
        .crossJoin(F.broadcast(stats))
    )
    m2 = (F.abs(F.col("__a0") - F.col("__b0")) <= F.col("r_tol")) & (
        F.abs(F.col("__a1") - F.col("__b1")) <= F.col("r_tol")
    )
    m3 = m2 & (F.abs(F.col("__a2") - F.col("__b2")) <= F.col("r_tol"))
    g = pairs.agg(
        F.max("n_days").alias("n_days"),
        F.max("r_tol").alias("r_tol"),
        F.sum(F.when(m2, 1).otherwise(0)).cast("bigint").alias("b_count"),
        F.sum(F.when(m3, 1).otherwise(0)).cast("bigint").alias("a_count"),
    )
    sampen = F.when(
        (F.col("a_count") > 0) & (F.col("b_count") > 0),
        -F.log(
            F.col("a_count").cast("double") / F.col("b_count").cast("double")
        ),
    ).otherwise(F.lit(None).cast("double"))
    return g.select(
        "n_days",
        F.round(F.col("r_tol"), round_to).alias("r_tol"),
        "b_count",
        "a_count",
        F.round(sampen, round_to).alias("sampen"),
    )


def sample_entropy_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    r_frac: float = 0.2,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`sample_entropy`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    tmpl AS (
      SELECT t, y AS v0,
             LEAD(y, 1) OVER (ORDER BY t) AS v1,
             LEAD(y, 2) OVER (ORDER BY t) AS v2
      FROM pts
      QUALIFY v2 IS NOT NULL
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             {r_frac!r} * SQRT(SUM(y * y) / CAST(COUNT(*) AS DOUBLE)
                               - (SUM(y) / CAST(COUNT(*) AS DOUBLE))
                                 * (SUM(y) / CAST(COUNT(*) AS DOUBLE)))
               AS r_tol
      FROM pts
    ),
    g AS (
      SELECT MAX(s.n_days) AS n_days, MAX(s.r_tol) AS r_tol,
             CAST(SUM(CASE WHEN ABS(a.v0 - b.v0) <= s.r_tol
                            AND ABS(a.v1 - b.v1) <= s.r_tol
                           THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
             CAST(SUM(CASE WHEN ABS(a.v0 - b.v0) <= s.r_tol
                            AND ABS(a.v1 - b.v1) <= s.r_tol
                            AND ABS(a.v2 - b.v2) <= s.r_tol
                           THEN 1 ELSE 0 END) AS BIGINT) AS a_count
      FROM tmpl a JOIN tmpl b ON a.t < b.t
      CROSS JOIN stats s
    )
    SELECT n_days,
           ROUND(r_tol, {round_to}) AS r_tol,
           b_count, a_count,
           ROUND(CASE WHEN a_count > 0 AND b_count > 0
                      THEN -LN(CAST(a_count AS DOUBLE)
                               / CAST(b_count AS DOUBLE))
                      ELSE NULL END,
                 {round_to}) AS sampen
    FROM g
    """


def permutation_entropy(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Permutation entropy of order 3 (Bandt & Pompe 2002): the
    Shannon entropy of the 6 ordinal patterns of consecutive value
    triples, normalized by ln(6) — 1 for white noise, small for
    deterministic dynamics; invariant to ANY monotone transform of
    the values (a robustness sample_entropy's amplitude tolerance
    doesn't have). Ties break by temporal order (the (value, index)
    sort convention), encoded as three ≤ comparisons so both engines
    bucket identically. One window pass + a ≤6-row groupBy. Output
    (one row): n_windows, n_patterns, perm_entropy."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    w = Window.orderBy("__t")
    tri = pts.select(
        F.col("__y").alias("__v0"),
        F.lead("__y", 1).over(w).alias("__v1"),
        F.lead("__y", 2).over(w).alias("__v2"),
    ).filter(F.col("__v2").isNotNull())
    pat = tri.select(
        (
            F.when(F.col("__v0") <= F.col("__v1"), 4).otherwise(0)
            + F.when(F.col("__v0") <= F.col("__v2"), 2).otherwise(0)
            + F.when(F.col("__v1") <= F.col("__v2"), 1).otherwise(0)
        ).alias("__p")
    )
    counts = pat.groupBy("__p").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    g = counts.agg(
        F.sum("__c").cast("bigint").alias("n_windows"),
        F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
        F.sum(
            F.col("__c").cast("double") * F.log(F.col("__c").cast("double"))
        ).alias("sclogc"),
    )
    nn = F.col("n_windows").cast("double")
    h = (F.log(nn) - F.col("sclogc") / nn) / F.log(F.lit(6.0))
    return g.select(
        "n_windows",
        "n_patterns",
        F.round(h, round_to).alias("perm_entropy"),
    )


def permutation_entropy_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`permutation_entropy`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    tri AS (
      SELECT y AS v0,
             LEAD(y, 1) OVER (ORDER BY t) AS v1,
             LEAD(y, 2) OVER (ORDER BY t) AS v2
      FROM pts
      QUALIFY v2 IS NOT NULL
    ),
    pat AS (
      SELECT (CASE WHEN v0 <= v1 THEN 4 ELSE 0 END
              + CASE WHEN v0 <= v2 THEN 2 ELSE 0 END
              + CASE WHEN v1 <= v2 THEN 1 ELSE 0 END) AS p
      FROM tri
    ),
    counts AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM pat GROUP BY p
    ),
    g AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_windows,
             CAST(COUNT(*) AS BIGINT) AS n_patterns,
             SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS sclogc
      FROM counts
    )
    SELECT n_windows, n_patterns,
           ROUND((LN(CAST(n_windows AS DOUBLE))
                  - sclogc / CAST(n_windows AS DOUBLE)) / LN(6.0),
                 {round_to}) AS perm_entropy
    FROM g
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 108: fractal scaling — DFA + Higuchi fractal dimension
# ──────────────────────────────────────────────────────────────────────────


def dfa_alpha(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    box_sizes: tuple = (8, 16, 32, 64),
    round_to: int = 6,
) -> DataFrame:
    """Detrended fluctuation analysis (Peng 1994): integrate the
    centered series into a profile, split into boxes of size s,
    linearly detrend EACH box, and fit log F(s) ~ α·log s over the
    RMS fluctuations — the long-memory exponent that, unlike
    hurst_rs, is valid under nonstationarity (trends are removed
    box-by-box, the whole reason DFA displaced R/S in physiology and
    finance). α ≈ 0.5 white noise, > 0.5 persistent, ≈ 1.5 random
    walk.

    Profile = window cumsum (sequentially deterministic in both
    engines); per-box detrending is the closed-form residual SS from
    six in-box moments (boxes are ≤ 64 rows, an exact-enough double
    sum); incomplete trailing boxes are dropped. The box stage is one
    explode over |box_sizes| literals — O(days·4) rows. Output (one
    row): n_days, f_s for each s, dfa_alpha."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y0"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    w_all = Window.partitionBy()
    norm = pts.select(
        "__t",
        (
            F.col("__y0") * F.count(F.lit(1)).over(w_all).cast("double")
            / F.sum("__y0").over(w_all)
            - F.lit(1.0)
        ).alias("__c"),
    )
    w_cum = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prof = norm.select(
        "__t", F.sum("__c").over(w_cum).alias("__p")
    )
    sizes = F.array(*[F.lit(s) for s in box_sizes])
    boxed = prof.select(
        "__t", "__p", F.explode(sizes).alias("__s")
    ).select(
        "__s",
        "__p",
        F.col("__t").cast("double").alias("__x"),
        F.floor((F.col("__t") - 1) / F.col("__s")).alias("__b"),
    )
    per_box = boxed.groupBy("__s", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum("__p").alias("sp"),
        F.sum(F.col("__p") * F.col("__p")).alias("spp"),
        F.sum(F.col("__x") * F.col("__p")).alias("sxp"),
    ).filter(F.col("cnt") == F.col("__s"))
    cc = F.col("cnt").cast("double")
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / cc
    spp_c = F.col("spp") - F.col("sp") * F.col("sp") / cc
    sxp_c = F.col("sxp") - F.col("sx") * F.col("sp") / cc
    ss_res = spp_c - sxp_c * sxp_c / sxx_c
    per_s = per_box.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boxes"),
        F.sum(ss_res).alias("t_ss"),
    ).select(
        "__s",
        F.sqrt(
            F.col("t_ss")
            / (F.col("n_boxes").cast("double") * F.col("__s").cast("double"))
        ).alias("__f"),
    )
    fit = per_s.select(
        F.log(F.col("__s").cast("double")).alias("__lx"),
        F.log("__f").alias("__ly"),
        "__s",
        "__f",
    )
    g = fit.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__lx").alias("slx"),
        F.sum(F.col("__lx") * F.col("__lx")).alias("slxx"),
        F.sum("__ly").alias("sly"),
        F.sum(F.col("__lx") * F.col("__ly")).alias("slxy"),
        *[
            F.max(F.when(F.col("__s") == s, F.col("__f"))).alias(f"f{s}")
            for s in box_sizes
        ],
    )
    kk = F.col("k").cast("double")
    alpha = (F.col("slxy") - F.col("slx") * F.col("sly") / kk) / (
        F.col("slxx") - F.col("slx") * F.col("slx") / kk
    )
    n_days = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return n_days.crossJoin(F.broadcast(g)).select(
        "n_days",
        *[F.round(F.col(f"f{s}"), round_to).alias(f"f{s}") for s in box_sizes],
        F.round(alpha, round_to).alias("dfa_alpha"),
    )


def dfa_alpha_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    box_sizes: tuple = (8, 16, 32, 64),
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`dfa_alpha`."""
    sizes = ", ".join(str(s) for s in box_sizes)
    f_cols = ",\n             ".join(
        f"MAX(CASE WHEN s = {s} THEN f END) AS f{s}" for s in box_sizes
    )
    f_out = ",\n           ".join(
        f"ROUND(f{s}, {round_to}) AS f{s}" for s in box_sizes
    )
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y0,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    norm AS (
      SELECT t, y0 * CAST(COUNT(*) OVER () AS DOUBLE) / SUM(y0) OVER ()
               - 1.0 AS c
      FROM pts
    ),
    prof AS (
      SELECT t, SUM(c) OVER (ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM norm
    ),
    boxed AS (
      SELECT s.s, CAST(prof.t AS DOUBLE) AS x, prof.p,
             CAST(FLOOR((prof.t - 1) / s.s) AS BIGINT) AS b
      FROM prof CROSS JOIN (SELECT unnest([{sizes}]) AS s) s
    ),
    per_box AS (
      SELECT s, b, CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(p) AS sp, SUM(p * p) AS spp, SUM(x * p) AS sxp
      FROM boxed GROUP BY s, b
      HAVING COUNT(*) = MAX(s)
    ),
    per_s AS (
      SELECT s,
             SQRT(SUM((spp - sp * sp / CAST(cnt AS DOUBLE))
                      - (sxp - sx * sp / CAST(cnt AS DOUBLE))
                        * (sxp - sx * sp / CAST(cnt AS DOUBLE))
                        / (sxx - sx * sx / CAST(cnt AS DOUBLE)))
                  / (CAST(COUNT(*) AS DOUBLE) * CAST(s AS DOUBLE))) AS f
      FROM per_box GROUP BY s
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(LN(CAST(s AS DOUBLE))) AS slx,
             SUM(LN(CAST(s AS DOUBLE)) * LN(CAST(s AS DOUBLE))) AS slxx,
             SUM(LN(f)) AS sly,
             SUM(LN(CAST(s AS DOUBLE)) * LN(f)) AS slxy,
             {f_cols}
      FROM per_s
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_days,
           {f_out},
           ROUND((slxy - slx * sly / CAST(k AS DOUBLE))
                 / (slxx - slx * slx / CAST(k AS DOUBLE)),
                 {round_to}) AS dfa_alpha
    FROM g
    """


def higuchi_fd(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    k_values: tuple = (1, 2, 3, 4, 6, 8),
    round_to: int = 6,
) -> DataFrame:
    """Higuchi fractal dimension (1988): average curve length L(k)
    over the k decimated sub-series at each lag k, fit
    ln L(k) ~ −D·ln k — the roughness dimension of the series graph,
    D ∈ [1, 2] (1 = smooth curve, 2 = space-filling noise; for
    fractional processes D ≈ 2 − α, the complement of dfa_alpha).

    The decimation trick: partitioning rows by (k, t mod k) and
    lagging within the partition gives y_{t−k} with ONE window pass
    over the |k_values|-exploded table — no per-k joins. Lengths use
    Higuchi's exact normalization (n−1)/(⌊(n−m)/k⌋·k²) per offset m,
    all counts exact bigints. Output (one row): n_days, higuchi_d,
    r2_fit."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y0"),
        F.row_number()
        .over(Window.orderBy(date_col))
        .cast("bigint")
        .alias("__t"),
    )
    w_all = Window.partitionBy()
    norm = pts.select(
        "__t",
        (
            F.col("__y0") * F.count(F.lit(1)).over(w_all).cast("double")
            / F.sum("__y0").over(w_all)
        ).alias("__y"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("__n"),
    )
    ks = F.array(*[F.lit(k) for k in k_values])
    ex = norm.select(
        "__t", "__y", "__n", F.explode(ks).alias("__k")
    ).select(
        "__k",
        "__t",
        "__y",
        "__n",
        ((F.col("__t") - 1) % F.col("__k")).alias("__m"),
    )
    w_dec = Window.partitionBy("__k", "__m").orderBy("__t")
    stepped = ex.select(
        "__k",
        "__m",
        "__n",
        F.abs(F.col("__y") - F.lag("__y").over(w_dec)).alias("__ad"),
    ).filter(F.col("__ad").isNotNull())
    per_m = stepped.groupBy("__k", "__m").agg(
        F.max("__n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.sum("__ad").alias("sad"),
    )
    # L_m(k) = sad * (n-1) / (n_steps * k^2)
    lm = per_m.select(
        "__k",
        (
            F.col("sad")
            * (F.col("n") - 1).cast("double")
            / (
                F.col("n_steps").cast("double")
                * F.col("__k").cast("double")
                * F.col("__k").cast("double")
            )
        ).alias("__lm"),
    )
    per_k = lm.groupBy("__k").agg(F.avg("__lm").alias("__lk"))
    fit = per_k.select(
        F.log(F.col("__k").cast("double")).alias("__lx"),
        F.log("__lk").alias("__ly"),
    )
    g = fit.agg(
        F.count(F.lit(1)).cast("bigint").alias("kk"),
        F.sum("__lx").alias("slx"),
        F.sum(F.col("__lx") * F.col("__lx")).alias("slxx"),
        F.sum("__ly").alias("sly"),
        F.sum(F.col("__ly") * F.col("__ly")).alias("slyy"),
        F.sum(F.col("__lx") * F.col("__ly")).alias("slxy"),
    )
    kk = F.col("kk").cast("double")
    sxx_c = F.col("slxx") - F.col("slx") * F.col("slx") / kk
    syy_c = F.col("slyy") - F.col("sly") * F.col("sly") / kk
    sxy_c = F.col("slxy") - F.col("slx") * F.col("sly") / kk
    d = -sxy_c / sxx_c
    r2 = sxy_c * sxy_c / (sxx_c * syy_c)
    n_days = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return n_days.crossJoin(F.broadcast(g)).select(
        "n_days",
        F.round(d, round_to).alias("higuchi_d"),
        F.round(r2, round_to).alias("r2_fit"),
    )


def higuchi_fd_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    k_values: tuple = (1, 2, 3, 4, 6, 8),
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`higuchi_fd`."""
    ks = ", ".join(str(k) for k in k_values)
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y0,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    norm AS (
      SELECT t,
             y0 * CAST(COUNT(*) OVER () AS DOUBLE) / SUM(y0) OVER () AS y,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM pts
    ),
    ex AS (
      SELECT k.k, norm.t, norm.y, norm.n,
             (norm.t - 1) % k.k AS m
      FROM norm CROSS JOIN (SELECT unnest([{ks}]) AS k) k
    ),
    stepped AS (
      SELECT k, m, n,
             ABS(y - LAG(y) OVER (PARTITION BY k, m ORDER BY t)) AS ad
      FROM ex
      QUALIFY ad IS NOT NULL
    ),
    per_m AS (
      SELECT k, m, MAX(n) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_steps,
             SUM(ad) AS sad
      FROM stepped GROUP BY k, m
    ),
    per_k AS (
      SELECT k,
             AVG(sad * CAST(n - 1 AS DOUBLE)
                 / (CAST(n_steps AS DOUBLE)
                    * CAST(k AS DOUBLE) * CAST(k AS DOUBLE))) AS lk
      FROM per_m GROUP BY k
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS kk,
             SUM(LN(CAST(k AS DOUBLE))) AS slx,
             SUM(LN(CAST(k AS DOUBLE)) * LN(CAST(k AS DOUBLE))) AS slxx,
             SUM(LN(lk)) AS sly,
             SUM(LN(lk) * LN(lk)) AS slyy,
             SUM(LN(CAST(k AS DOUBLE)) * LN(lk)) AS slxy
      FROM per_k
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_days,
           ROUND(-(slxy - slx * sly / CAST(kk AS DOUBLE))
                 / (slxx - slx * slx / CAST(kk AS DOUBLE)),
                 {round_to}) AS higuchi_d,
           ROUND((slxy - slx * sly / CAST(kk AS DOUBLE))
                 * (slxy - slx * sly / CAST(kk AS DOUBLE))
                 / ((slxx - slx * slx / CAST(kk AS DOUBLE))
                    * (slyy - sly * sly / CAST(kk AS DOUBLE))),
                 {round_to}) AS r2_fit
    FROM g
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 112: Inclán-Tiao CUSUM of squares (variance changepoint)
# ──────────────────────────────────────────────────────────────────────────


def cusum_squares(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Inclán-Tiao centered CUSUM of SQUARES: where cusum_changepoint
    hunts a mean shift, this hunts a VARIANCE shift — D_t = C_t/C_n −
    t/n over cumulative squared deviations from the global mean, the
    statistic √(n/2)·max|D_t| and its argmax day (the volatility-
    regime boundary). Asymptotic 5%/1% critical values 1.358/1.628
    (the Brownian-bridge sup).

    The mean is an exact rational of the DECIMAL-backed sums; the
    cumulative squares are a window prefix sum (sequentially
    deterministic); argmax ties break to the earliest day. O(days),
    no joins. Output (one row): n_days, break_day, d_max, it_stat."""
    pts = daily.select(
        F.col(date_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("double").alias("__y"),
    )
    w_all = Window.partitionBy()
    centered = pts.select(
        "__d",
        (
            F.col("__y")
            - F.sum("__y").over(w_all)
            / F.count(F.lit(1)).over(w_all).cast("double")
        ).alias("__e"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("__n"),
    )
    w_cum = Window.orderBy("__d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_t = Window.orderBy("__d")
    stepped = centered.select(
        "__d",
        "__n",
        F.sum(F.col("__e") * F.col("__e")).over(w_cum).alias("__c"),
        F.row_number().over(w_t).cast("bigint").alias("__t"),
    )
    tot = stepped.agg(F.max("__c").alias("__cn"))
    d_t = stepped.crossJoin(F.broadcast(tot)).select(
        "__d",
        "__n",
        F.abs(
            F.col("__c") / F.col("__cn")
            - F.col("__t").cast("double") / F.col("__n").cast("double")
        ).alias("__dt"),
    )
    w_rank = Window.orderBy(F.col("__dt").desc(), F.col("__d"))
    best = d_t.select(
        "__d", "__n", "__dt", F.row_number().over(w_rank).alias("__r")
    ).filter(F.col("__r") == 1)
    return best.select(
        F.col("__n").alias("n_days"),
        F.col("__d").alias("break_day"),
        F.round(F.col("__dt"), round_to).alias("d_max"),
        F.round(
            F.sqrt(F.col("__n").cast("double") / F.lit(2.0))
            * F.col("__dt"),
            round_to,
        ).alias("it_stat"),
    )


def cusum_squares_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cusum_squares`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({date_col} AS BIGINT) AS dd,
             CAST({value_col} AS DOUBLE) AS y
      FROM d
    ),
    centered AS (
      SELECT dd,
             y - SUM(y) OVER () / CAST(COUNT(*) OVER () AS DOUBLE) AS e,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM pts
    ),
    stepped AS (
      SELECT dd, n,
             SUM(e * e) OVER (ORDER BY dd
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
             CAST(ROW_NUMBER() OVER (ORDER BY dd) AS BIGINT) AS t
      FROM centered
    ),
    tot AS (SELECT MAX(c) AS cn FROM stepped),
    d_t AS (
      SELECT dd, n,
             ABS(c / cn - CAST(t AS DOUBLE) / CAST(n AS DOUBLE)) AS dt
      FROM stepped CROSS JOIN tot
    ),
    best AS (
      SELECT dd, n, dt,
             ROW_NUMBER() OVER (ORDER BY dt DESC, dd) AS r
      FROM d_t
    )
    SELECT n AS n_days, dd AS break_day,
           ROUND(dt, {round_to}) AS d_max,
           ROUND(SQRT(CAST(n AS DOUBLE) / 2.0) * dt, {round_to})
             AS it_stat
    FROM best WHERE r = 1
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 115: Rousseeuw-Croux Qn robust scale
# ──────────────────────────────────────────────────────────────────────────


def qn_scale(
    daily: DataFrame,
    value_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """Rousseeuw-Croux Qn scale estimator: the k-th order statistic
    of all pairwise distances, k = C(h,2) with h = ⌊n/2⌋+1, scaled by
    the Gaussian-consistency constant 2.2219 — the robust scale that
    beats the MAD where it matters: 50% breakdown WITH 82% Gaussian
    efficiency (MAD: 37%) and no symmetry assumption (MAD centers on
    the median; Qn is location-free). Reported beside 1.4826·MAD and
    the classical SD so the three scales' disagreement IS the
    outlier/asymmetry read-out.

    The pair stage is the bounded daily-rollup self-join (the
    distance_correlation discipline); the k-th order statistic is a
    value (tie order cannot change it), picked by one rank window
    over the pair table. Output (one row): n, n_pairs, k, qn,
    mad_scaled, sd."""
    pts = daily.select(
        F.col(value_col).cast("double").alias("__y")
    ).filter(F.col("__y").isNotNull())
    idx = pts.select(
        "__y",
        F.row_number()
        .over(Window.orderBy("__y"))
        .cast("bigint")
        .alias("__i"),
    )
    a = idx.select(F.col("__y").alias("__ya"), F.col("__i").alias("__ia"))
    b = idx.select(F.col("__y").alias("__yb"), F.col("__i").alias("__ib"))
    pairs = a.join(b, F.col("__ib") > F.col("__ia")).select(
        F.abs(F.col("__ya") - F.col("__yb")).alias("__d")
    )
    stats = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.expr("percentile(__y, 0.5)").alias("med"),
    )
    mad = (
        pts.crossJoin(F.broadcast(stats.select("med")))
        .select(F.abs(F.col("__y") - F.col("med")).alias("__ad"))
        .agg(F.expr("percentile(__ad, 0.5)").alias("mad"))
    )
    ranked = pairs.crossJoin(F.broadcast(stats.select("n"))).select(
        "__d",
        "n",
        F.row_number().over(Window.orderBy("__d")).cast("bigint").alias(
            "__r"
        ),
    )
    h = F.floor(F.col("n") / 2) + 1
    k = (h * (h - 1) / 2).cast("bigint")
    picked = ranked.filter(F.col("__r") == k).select(
        "n",
        F.col("__r").alias("k"),
        F.col("__d").alias("__dk"),
    )
    nn = F.col("n").cast("double")
    sd = F.sqrt(
        (F.col("syy") - F.col("sy") * F.col("sy") / nn) / (nn - 1.0)
    )
    return (
        picked.crossJoin(
            F.broadcast(stats.select("sy", "syy", F.col("n").alias("__n2")))
        )
        .crossJoin(F.broadcast(mad))
        .select(
            "n",
            (F.col("__n2") * (F.col("__n2") - 1) / 2)
            .cast("bigint")
            .alias("n_pairs"),
            "k",
            F.round(F.lit(2.2219) * F.col("__dk"), round_to).alias("qn"),
            F.round(F.lit(1.4826) * F.col("mad"), round_to).alias(
                "mad_scaled"
            ),
            F.round(sd, round_to).alias("sd"),
        )
    )


def qn_scale_sql(
    daily_sql: str,
    value_col: str = "y",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`qn_scale`."""
    return f"""
    WITH d AS ({daily_sql}),
    pts AS (
      SELECT CAST({value_col} AS DOUBLE) AS y FROM d
      WHERE {value_col} IS NOT NULL
    ),
    idx AS (
      SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY y) AS BIGINT) AS i
      FROM pts
    ),
    pairs AS (
      SELECT ABS(a.y - b.y) AS dd
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
             SUM(y * y) AS syy, quantile_cont(y, 0.5) AS med
      FROM pts
    ),
    madt AS (
      SELECT quantile_cont(ABS(p.y - s.med), 0.5) AS mad
      FROM pts p CROSS JOIN stats s
    ),
    ranked AS (
      SELECT dd, CAST(ROW_NUMBER() OVER (ORDER BY dd) AS BIGINT) AS r
      FROM pairs
    ),
    picked AS (
      SELECT r AS k, dd AS dk
      FROM ranked CROSS JOIN stats
      WHERE r = CAST((FLOOR(n / 2) + 1) * FLOOR(n / 2) / 2 AS BIGINT)
    )
    SELECT s.n,
           CAST(s.n * (s.n - 1) / 2 AS BIGINT) AS n_pairs,
           p.k,
           ROUND(2.2219 * p.dk, {round_to}) AS qn,
           ROUND(1.4826 * m.mad, {round_to}) AS mad_scaled,
           ROUND(SQRT((s.syy - s.sy * s.sy / CAST(s.n AS DOUBLE))
                      / (CAST(s.n AS DOUBLE) - 1.0)), {round_to}) AS sd
    FROM picked p CROSS JOIN stats s CROSS JOIN madt m
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 128: Cameron-Trivedi overdispersion test for count series
# ──────────────────────────────────────────────────────────────────────────


def overdispersion_test(
    daily: DataFrame,
    group_col: str = "event_type",
    value_col: str = "c",
    round_to: int = 6,
) -> DataFrame:
    """Cameron-Trivedi overdispersion test per group over a daily
    COUNT series — "is Poisson even the right error model?", the
    question every Poisson rate CI and exponential-interarrival test
    in the suite silently assumes away. Under the constant-mean
    Poisson null, ``T = Σ[(y-μ̂)² - y] / sqrt(2 Σ μ̂²) ~ N(0,1)``;
    large positive T means variance grows faster than the mean
    (negative binomial territory).

    Exactness: with S = Σy and Q = Σ(n·y - S)² (both EXACT BIGINTs —
    counts are integers, so every term is an integer), the statistic
    is ``(Q/n² - S) / sqrt(2·S²/n)`` — integer-exact numerators, one
    sqrt, order-independent in any engine (the wave-118 discipline;
    no double accumulates anywhere). One groupBy over the
    days-per-group table. Headroom: n²·Σy² must fit int64 — with the
    bounded calendar (n ≈ 150 days) that allows daily counts up to
    ~2e7 (~300x the sf0.1 series); past that, move Q to DECIMAL.

    Output per group: (group, n_days, mean_count, dispersion_index,
    ct_stat, overdispersed) ordered by group.
    """
    g = daily.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("bigint")).cast("bigint").alias("s"),
        F.sum(
            F.col(value_col).cast("bigint") * F.col(value_col).cast("bigint")
        )
        .cast("bigint")
        .alias("s2"),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    # Q = sum (n*y - S)^2 = n^2*S2 - 2nS*S + n*S^2 = n^2*S2 - n*S^2
    q = (
        F.col("n") * F.col("n") * F.col("s2") - F.col("n") * F.col("s") * F.col("s")
    ).cast("double")
    ct_num = q / (n * n) - s
    ct_den = F.sqrt(F.lit(2.0) * s * s / n)
    disp = (q / (n * n)) / (n - F.lit(1.0)) / (s / n)
    ct = ct_num / ct_den
    return g.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_days"),
        F.round(s / n, round_to).alias("mean_count"),
        F.round(disp, round_to).alias("dispersion_index"),
        F.round(ct, round_to).alias("ct_stat"),
        (ct > F.lit(1.6449)).alias("overdispersed"),
    ).orderBy(group_col)


def overdispersion_test_sql(
    daily_sql: str,
    group_col: str = "event_type",
    value_col: str = "c",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`overdispersion_test`."""
    return f"""
    WITH d AS ({daily_sql}),
    g AS (
      SELECT {group_col} AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST({value_col} AS BIGINT)) AS BIGINT) AS s,
             CAST(SUM(CAST({value_col} AS BIGINT)
                      * CAST({value_col} AS BIGINT)) AS BIGINT) AS s2
      FROM d GROUP BY 1
    )
    SELECT grp AS {group_col},
           n AS n_days,
           ROUND(CAST(s AS DOUBLE) / n, {round_to}) AS mean_count,
           ROUND((CAST(n * n * s2 - n * s * s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n))
                 / (CAST(n AS DOUBLE) - 1.0)
                 / (CAST(s AS DOUBLE) / n), {round_to}) AS dispersion_index,
           ROUND((CAST(n * n * s2 - n * s * s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n) - CAST(s AS DOUBLE))
                 / sqrt(2.0 * CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE)), {round_to}) AS ct_stat,
           ((CAST(n * n * s2 - n * s * s AS DOUBLE)
               / (CAST(n AS DOUBLE) * n) - CAST(s AS DOUBLE))
            / sqrt(2.0 * CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE))) > 1.6449 AS overdispersed
    FROM g ORDER BY grp
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 136: Croston's method (+ SBA) for intermittent demand
# ──────────────────────────────────────────────────────────────────────────


def croston_forecast(
    demand: DataFrame,
    key_col: str = "item",
    day_col: str = "day",
    qty_col: str = "qty",
    alpha: float = 0.2,
    min_events: int = 3,
) -> DataFrame:
    """Croston's method (Croston 1972) with the Syntetos-Boylan
    approximation — THE intermittent-demand forecaster: plain SES on a
    mostly-zero series chases zeros down and spikes up, so Croston
    smooths the nonzero demand SIZES and the inter-demand INTERVALS
    separately and forecasts ``ẑ/p̂`` per period; SBA multiplies by
    ``(1 - α/2)`` to kill Croston's positive bias. The spare-parts /
    slow-mover complement to holt_linear_backtest (which assumes a
    dense series).

    Determinism: the double SES recursion is a FIXED-ORDER IEEE fold
    over each key's day-sorted demand events (the holt_linear
    discipline — one ``aggregate()`` in Spark, the identical
    expressions as a recursive CTE in DuckDB), initialized
    ẑ₁ = z₁ and p̂₂ = i₂ (the first observable interval), so every
    output double is bit-identical with NO rounding. Demand sizes and
    intervals are exact integers.

    Scale shape: the fact table reduces to per-(key, day) demand once;
    each key's event array is bounded by ITS demand sparsity (that is
    the point of the method), folding inside one task.

    Output per key with >= ``min_events`` demand days: (key, n_demands,
    z_hat, p_hat, croston_rate, sba_rate), ordered by key.
    """
    a = float(alpha)
    per_day = demand.groupBy(
        F.col(key_col).alias("k"), F.col(day_col).alias("d")
    ).agg(F.sum(F.col(qty_col)).cast("bigint").alias("z"))
    series = (
        per_day.filter(F.col("z") > 0)
        .groupBy("k")
        .agg(
            F.sort_array(F.collect_list(F.struct("d", "z"))).alias("ev")
        )
        .filter(F.size("ev") >= min_events)
    )
    fold = F.expr(
        f"""
        aggregate(
          slice(ev, 2, greatest(size(ev) - 1, 0)),
          named_struct('pd', ev[0].d, 'z', cast(ev[0].z as double),
                       'p', cast(-1.0 as double)),
          (acc, e) -> named_struct(
            'pd', e.d,
            'z', {a}D * e.z + {1 - a}D * acc.z,
            'p', if(acc.p < 0.0,
                    cast(e.d - acc.pd as double),
                    {a}D * (e.d - acc.pd) + {1 - a}D * acc.p)),
          acc -> acc)
        """
    )
    out = series.select(
        F.col("k").alias(key_col),
        F.size("ev").cast("bigint").alias("n_demands"),
        fold.alias("__st"),
    )
    rate = F.col("__st.z") / F.col("__st.p")
    return out.select(
        key_col,
        "n_demands",
        F.col("__st.z").alias("z_hat"),
        F.col("__st.p").alias("p_hat"),
        rate.alias("croston_rate"),
        (F.lit(1.0 - a / 2.0) * rate).alias("sba_rate"),
    ).orderBy(key_col)


def croston_forecast_sql(
    demand_sql: str,
    key_col: str = "item",
    day_col: str = "day",
    qty_col: str = "qty",
    alpha: float = 0.2,
    min_events: int = 3,
) -> str:
    """DuckDB twin of :func:`croston_forecast` — the same IEEE
    recursion as a recursive CTE."""
    a = float(alpha)
    return f"""
    WITH RECURSIVE src AS ({demand_sql}),
    per_day AS (
      SELECT {key_col} AS k, {day_col} AS d,
             CAST(SUM({qty_col}) AS BIGINT) AS z
      FROM src GROUP BY 1, 2
    ),
    ev AS (
      SELECT k, d, z,
             CAST(row_number() OVER (PARTITION BY k ORDER BY d) AS BIGINT)
               AS i,
             CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS m
      FROM per_day WHERE z > 0
    ),
    keys AS (SELECT k, MAX(m) AS n_demands FROM ev GROUP BY k
             HAVING MAX(m) >= {min_events}),
    rec AS (
      SELECT e.k, e.i, e.d AS pd, CAST(e.z AS DOUBLE) AS zh,
             CAST(-1.0 AS DOUBLE) AS ph
      FROM ev e JOIN keys USING (k) WHERE e.i = 1
      UNION ALL
      SELECT r.k, e.i, e.d,
             CAST({a} AS DOUBLE) * e.z + CAST({1 - a} AS DOUBLE) * r.zh,
             CASE WHEN r.ph < 0.0
                  THEN CAST(e.d - r.pd AS DOUBLE)
                  ELSE CAST({a} AS DOUBLE) * (e.d - r.pd)
                       + CAST({1 - a} AS DOUBLE) * r.ph END
      FROM rec r JOIN ev e ON e.k = r.k AND e.i = r.i + 1
    )
    SELECT r.k AS {key_col},
           keys.n_demands,
           r.zh AS z_hat,
           r.ph AS p_hat,
           r.zh / r.ph AS croston_rate,
           CAST({1.0 - a / 2.0} AS DOUBLE) * (r.zh / r.ph) AS sba_rate
    FROM rec r
    JOIN keys ON keys.k = r.k
    WHERE r.i = keys.n_demands
    ORDER BY {key_col}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 138: the Theta method (Assimakopoulos & Nikolopoulos 2000)
# ──────────────────────────────────────────────────────────────────────────


def theta_forecast(
    daily: DataFrame,
    date_col: str = "day",
    value_col: str = "y",
    alpha: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """The Theta method — winner of the M3 forecasting competition and
    still the classical benchmark every new forecaster must beat: the
    series decomposes into theta-lines ``Z_theta(t) = theta·y_t +
    (1-theta)·L_t`` around the linear trend L; theta = 0 IS the trend
    (long-run signal), theta = 2 doubles local curvature (short-run
    signal, forecast by SES); the forecast combines both with equal
    weights:

      ``f = 0.5 · (SES(Z_2)_n + L(n+1))``.

    Completes the classical trio beside holt_linear_backtest (dense
    trending) and croston_forecast (intermittent).

    Determinism: the OLS trend uses exact DECIMAL/bigint moments
    (wave-118); the SES recursion over Z_2 is a fixed-order IEEE fold
    over the day-sorted array (the holt/croston discipline); the
    one-step backtest error accumulates inside the same fold. Only
    O(y)-scale ROUND targets.

    Output (one row): (n_days, slope, intercept, ses_theta2,
    forecast_next, mae_backtest).
    """
    a = float(alpha)
    yd = F.col(value_col).cast("decimal(18,2)")
    idx = daily.select(
        yd.alias("__y"),
        F.row_number().over(Window.orderBy(date_col)).alias("__t"),
    ).localCheckpoint(eager=False)
    td = F.col("__t").cast("decimal(10,0)")
    mom = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__t").cast("bigint").alias("st"),
        F.sum(F.col("__t") * F.col("__t")).cast("bigint").alias("st2"),
        F.sum("__y").alias("sy"),
        F.sum(td * F.col("__y")).alias("sty"),
    )
    nn = F.col("n").cast("double")
    st = F.col("st").cast("double")
    sxx = F.col("st2").cast("double") - st * st / nn
    sxy = F.col("sty").cast("double") - st * F.col("sy").cast("double") / nn
    ab = mom.select(
        "n",
        (sxy / sxx).alias("b"),
        ((F.col("sy").cast("double") - (sxy / sxx) * st) / nn).alias("a0"),
    )
    z2 = idx.crossJoin(F.broadcast(ab)).select(
        "n",
        "a0",
        "b",
        F.col("__t").alias("t"),
        (
            F.lit(2.0) * F.col("__y").cast("double")
            - (F.col("a0") + F.col("b") * F.col("__t").cast("double"))
        ).alias("z"),
    )
    series = z2.groupBy("n", "a0", "b").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("t", "z"))),
            lambda s: s["z"],
        ).alias("zs")
    )
    fold = F.expr(
        f"""
        aggregate(
          slice(zs, 2, greatest(size(zs) - 1, 0)),
          named_struct('l', zs[0], 'e', cast(0.0 as double),
                       'm', cast(0 as bigint)),
          (acc, z) -> named_struct(
            'l', {a}D * z + {1 - a}D * acc.l,
            'e', acc.e + abs(z - acc.l),
            'm', acc.m + 1L),
          acc -> acc)
        """
    )
    out = series.select("n", "a0", "b", fold.alias("__st"))
    trend_next = F.col("a0") + F.col("b") * (F.col("n") + 1).cast("double")
    return out.select(
        F.col("n").alias("n_days"),
        F.round("b", round_to).alias("slope"),
        F.round("a0", round_to).alias("intercept"),
        F.round(F.col("__st.l"), round_to).alias("ses_theta2"),
        F.round(
            F.lit(0.5) * (F.col("__st.l") + trend_next), round_to
        ).alias("forecast_next"),
        F.round(
            F.col("__st.e") / F.col("__st.m").cast("double"), round_to
        ).alias("mae_backtest"),
    )


def theta_forecast_sql(
    daily_sql: str,
    date_col: str = "day",
    value_col: str = "y",
    alpha: float = 0.3,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`theta_forecast` (explicit DOUBLE-cast
    smoothing literals — DuckDB parses decimal-point literals as
    DECIMAL, which would mix decimal arithmetic into the recursion)."""
    a = float(alpha)
    return f"""
    WITH RECURSIVE d AS ({daily_sql}),
    idx AS (
      SELECT CAST({value_col} AS DECIMAL(18,2)) AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY {date_col}) AS BIGINT) AS t
      FROM d
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS st2,
             CAST(SUM(y) AS DECIMAL(28,2)) AS sy,
             CAST(SUM(CAST(t AS DECIMAL(10,0)) * y) AS DECIMAL(32,2)) AS sty
      FROM idx
    ),
    ab AS (
      SELECT n,
             (CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                / CAST(n AS DOUBLE)) AS b,
             (CAST(sy AS DOUBLE)
              - ((CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 / (CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                    / CAST(n AS DOUBLE))) * CAST(st AS DOUBLE))
             / CAST(n AS DOUBLE) AS a0
      FROM mom
    ),
    z2 AS (
      SELECT idx.t, n, a0, b,
             2.0 * CAST(y AS DOUBLE) - (a0 + b * CAST(t AS DOUBLE)) AS z
      FROM idx CROSS JOIN ab
    ),
    rec AS (
      SELECT t, n, a0, b, z AS l, CAST(0.0 AS DOUBLE) AS e,
             CAST(0 AS BIGINT) AS m
      FROM z2 WHERE t = 1
      UNION ALL
      SELECT z2.t, r.n, r.a0, r.b,
             CAST({a} AS DOUBLE) * z2.z + CAST({1 - a} AS DOUBLE) * r.l,
             r.e + abs(z2.z - r.l),
             r.m + 1
      FROM rec r JOIN z2 ON z2.t = r.t + 1
    )
    SELECT n AS n_days,
           ROUND(b, {round_to}) AS slope,
           ROUND(a0, {round_to}) AS intercept,
           ROUND(l, {round_to}) AS ses_theta2,
           ROUND(0.5 * (l + (a0 + b * CAST(n + 1 AS DOUBLE))), {round_to})
             AS forecast_next,
           ROUND(e / CAST(m AS DOUBLE), {round_to}) AS mae_backtest
    FROM rec WHERE t = n
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 153: Holt-Winters additive seasonal backtest
# ──────────────────────────────────────────────────────────────────────────


def holt_winters_backtest(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = 0.5,
    beta: float = 0.1,
    gamma: float = 0.3,
    period: int = 7,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (level + trend +
    day-of-week season) one-step-ahead backtest per group's daily
    counts — the seasonal completion of :func:`holt_linear_backtest`
    (which a weekly-rhythmed series defeats: its trend chases the
    weekend dip every single week):

      f_t = l + b + s_{t mod p};
      l' = α(x − s) + (1−α)(l+b);  b' = β(l'−l) + (1−β)b;
      s' = γ(x − l') + (1−γ)s;
      seeds: l = mean(first p), b = 0, s_i = x_i − l (i = 1..p),
      fold from day p+1; groups with ≤ p days are DROPPED
      (insufficient to seed one full season — documented contract).

    Determinism: the holt_linear discipline — one FIXED-ORDER IEEE
    fold (Spark ``aggregate()`` over the day-sorted array, JVM
    codegen, the seasonal state as a p-slot array updated via
    indexed ``transform``; DuckDB as a recursive CTE carrying the p
    seasonal slots as columns) — bit-identical without rounding.

    Scale shape: the corpus reduces to the daily rollup once; each
    group's series (bounded by the calendar) folds inside one task.
    Output: (group, n_days, mae, level, trend, forecast_next).
    """
    a, b, g = float(alpha), float(beta), float(gamma)
    p = int(period)
    daily = df.groupBy(
        F.col(group_col).alias("g"), F.col(ts_col).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    series = daily.groupBy("g").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("d", "x"))),
            lambda s: s["x"].cast("double"),
        ).alias("xs")
    ).filter(F.size("xs") > p)
    mean_p = F.expr(
        f"aggregate(slice(xs, 1, {p}), cast(0.0 as double),"
        f" (pp, qq) -> pp + qq) / {float(p)!r}D"
    )
    staged = series.select("g", "xs", mean_p.alias("m0"))
    idx = "cast(acc.n % {p} as int)"
    s_at = f"element_at(acc.s, {idx.format(p=p)} + 1)"
    lnew = f"{a!r}D * (x - {s_at}) + {1 - a!r}D * (acc.l + acc.b)"
    fold = F.expr(
        f"""
        aggregate(
          slice(xs, {p + 1}, greatest(size(xs) - {p}, 0)),
          named_struct(
            'l', m0, 'b', cast(0.0 as double),
            's', transform(slice(xs, 1, {p}), v -> v - m0),
            'e', cast(0.0 as double), 'n', cast(0 as bigint)),
          (acc, x) -> named_struct(
            'l', {lnew},
            'b', {b!r}D * (({lnew}) - acc.l) + {1 - b!r}D * acc.b,
            's', transform(acc.s, (v, i) -> if(i = {idx.format(p=p)},
                   {g!r}D * (x - ({lnew})) + {1 - g!r}D * v, v)),
            'e', acc.e + abs(x - (acc.l + acc.b + {s_at})),
            'n', acc.n + 1L),
          acc -> acc)
        """
    )
    out = staged.select(
        F.col("g").alias(group_col),
        F.size("xs").cast("bigint").alias("n_days"),
        fold.alias("__st"),
    )
    nxt = F.expr(
        f"__st.l + __st.b + element_at(__st.s,"
        f" cast(__st.n % {p} as int) + 1)"
    )
    return out.select(
        group_col,
        "n_days",
        (F.col("__st.e") / F.col("__st.n")).alias("mae"),
        F.col("__st.l").alias("level"),
        F.col("__st.b").alias("trend"),
        nxt.alias("forecast_next"),
    ).orderBy(group_col)


def holt_winters_backtest_sql(
    table: str = "events",
    group_col: str = "event_type",
    ts_col: str = "ts",
    alpha: float = 0.5,
    beta: float = 0.1,
    gamma: float = 0.3,
    period: int = 7,
) -> str:
    """DuckDB twin of :func:`holt_winters_backtest` — the identical
    IEEE recursion as a recursive CTE with the p seasonal slots as
    columns (s0..s{p-1})."""
    a, b, g = float(alpha), float(beta), float(gamma)
    p = int(period)
    s_cols = ", ".join(f"s{j}" for j in range(p))
    s_case = (
        "CASE CAST(r.n % {p} AS INTEGER) "
        + " ".join(f"WHEN {j} THEN r.s{j}" for j in range(p))
        + " END"
    ).format(p=p)
    lnew = f"{a!r} * (d.x - {s_case}) + {1 - a!r} * (r.l + r.b)"
    s_seed = ",\n             ".join(
        f"(SELECT CAST(x AS DOUBLE) FROM daily dd"
        f" WHERE dd.g = m.g AND dd.i = {j + 1}) - m.m0 AS s{j}"
        for j in range(p)
    )
    s_step = ",\n             ".join(
        f"CASE WHEN CAST(r.n % {p} AS INTEGER) = {j}"
        f" THEN {g!r} * (d.x - ({lnew})) + {1 - g!r} * r.s{j}"
        f" ELSE r.s{j} END"
        for j in range(p)
    )
    return f"""
    WITH RECURSIVE daily AS (
      SELECT g, d, x,
             CAST(row_number() OVER (PARTITION BY g ORDER BY d)
                  AS BIGINT) AS i
      FROM (SELECT {group_col} AS g, CAST({ts_col} AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM {table} GROUP BY 1, 2)
    ),
    m AS (
      SELECT g,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 LIST(CAST(x AS DOUBLE) ORDER BY i)
                   FILTER (WHERE i <= {p})),
               (pp, qq) -> pp + qq) / {float(p)!r} AS m0,
             CAST(MAX(i) AS BIGINT) AS n_days
      FROM daily GROUP BY g HAVING MAX(i) > {p}
    ),
    rec AS (
      SELECT m.g, CAST({p} AS BIGINT) AS i, m.m0 AS l,
             CAST(0.0 AS DOUBLE) AS b,
             {s_seed},
             CAST(0.0 AS DOUBLE) AS e, CAST(0 AS BIGINT) AS n
      FROM m
      UNION ALL
      SELECT r.g, d.i,
             {lnew},
             {b!r} * (({lnew}) - r.l) + {1 - b!r} * r.b,
             {s_step},
             r.e + abs(d.x - (r.l + r.b + {s_case})),
             r.n + 1
      FROM rec r JOIN daily d ON d.g = r.g AND d.i = r.i + 1
    )
    SELECT r.g AS {group_col}, m.n_days,
           r.e / r.n AS mae,
           r.l AS level, r.b AS trend,
           r.l + r.b + (CASE CAST(r.n % {p} AS INTEGER) {' '.join(
               f'WHEN {j} THEN r.s{j}' for j in range(p))} END)
             AS forecast_next
    FROM rec r JOIN m ON m.g = r.g AND r.i = m.n_days
    ORDER BY 1
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 156: GPH log-periodogram long-memory estimator
# ──────────────────────────────────────────────────────────────────────────


def gph_long_memory(
    df: DataFrame,
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Geweke & Porter-Hudak (1983) log-periodogram estimate of the
    long-memory parameter d of the daily count series — the THIRD,
    frequency-domain member of the long-memory triangle beside
    hurst_rs_daily (R/S) and dfa_alpha_daily (detrended fluctuation):
    three estimators agreeing on d ≈ H − 1/2 is the standard evidence
    pattern, each being biased in different ways.

      I(ω_j) ∝ c_j² + s_j²,  c_j = Σ_t x̃_t cos(ω_j t),
      ω_j = 2πj/T, j = 1..m = ⌊√T⌋;
      regress log I(ω_j) on x_j = log(4 sin²(ω_j/2)): d̂ = −slope,
      SE(d̂) = sqrt((π²/6) / Σ(x_j − x̄)²)  (known error variance).

    The proportionality constant in I only shifts the regression
    intercept — the slope (and so d̂) is invariant, so no 2πT
    normalizer is carried. Frequencies are indexed by the first m day
    rows themselves (j = i ≤ m), which keeps the frequency count
    data-dependent WITHOUT a dynamic plan: the trig projection is one
    T×m cross of the days-sized rollup, the periodogram_power
    discipline. Zero-power lines (exact-zero periodogram, measure-zero
    in practice) are excluded before the log.

    Output (one row): (n_obs, m_freqs, d_hat, se_asymp, t_stat).
    """
    w = Window.orderBy("d")
    daily = (
        df.groupBy(F.col(ts_col).cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .withColumn("i", F.row_number().over(w).cast("bigint"))
    )
    stats = daily.agg(
        F.avg("x").alias("__mu"),
        F.count(F.lit(1)).cast("bigint").alias("__t"),
    )
    cen = daily.crossJoin(F.broadcast(stats)).select(
        "i", (F.col("x") - F.col("__mu")).alias("xc"), "__t"
    )
    freqs = cen.filter(
        F.col("i")
        <= F.floor(F.sqrt(F.col("__t").cast("double"))).cast("bigint")
    ).select(F.col("i").alias("j"), F.col("__t").alias("t_tot"))
    ang = (
        2.0
        * _PI
        * F.col("j").cast("double")
        * F.col("i").cast("double")
        / F.col("t_tot").cast("double")
    )
    per = (
        cen.select("i", "xc")
        .crossJoin(freqs)
        .groupBy("j", "t_tot")
        .agg(
            F.sum(F.col("xc") * F.cos(ang)).alias("__c"),
            F.sum(F.col("xc") * F.sin(ang)).alias("__s"),
        )
    )
    logi = per.filter(
        F.col("__c") * F.col("__c") + F.col("__s") * F.col("__s") > 0
    ).select(
        "t_tot",
        F.log(
            F.col("__c") * F.col("__c") + F.col("__s") * F.col("__s")
        ).alias("ly"),
        F.log(
            4.0
            * F.pow(
                F.sin(
                    _PI
                    * F.col("j").cast("double")
                    / F.col("t_tot").cast("double")
                ),
                2.0,
            )
        ).alias("lx"),
    )
    agg = logi.agg(
        F.max("t_tot").alias("n_obs"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    mm = F.col("m").cast("double")
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / mm
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / mm
    d_hat = -(sxy_c / sxx_c)
    se = F.sqrt((_PI * _PI / 6.0) / sxx_c)
    return agg.select(
        "n_obs",
        F.col("m").alias("m_freqs"),
        F.round(d_hat, round_to).alias("d_hat"),
        F.round(se, round_to).alias("se_asymp"),
        F.round(d_hat / se, round_to).alias("t_stat"),
    )


def gph_long_memory_sql(
    table: str = "events",
    ts_col: str = "ts",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`gph_long_memory` (same day-index
    frequencies, same closed-form order)."""
    pi = repr(_PI)
    return f"""
    WITH daily AS (
      SELECT d, x,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
      FROM (SELECT CAST({ts_col} AS DATE) AS d,
                   CAST(COUNT(*) AS DOUBLE) AS x
            FROM {table} GROUP BY 1)
    ),
    stats AS (
      SELECT AVG(x) AS mu, CAST(COUNT(*) AS BIGINT) AS t FROM daily
    ),
    cen AS (
      SELECT i, x - stats.mu AS xc, stats.t AS t_tot
      FROM daily CROSS JOIN stats
    ),
    freqs AS (
      SELECT i AS j, t_tot FROM cen
      WHERE i <= CAST(FLOOR(SQRT(CAST(t_tot AS DOUBLE))) AS BIGINT)
    ),
    per AS (
      SELECT f.j, f.t_tot,
             SUM(c.xc * COS(2.0 * {pi} * CAST(f.j AS DOUBLE)
                            * CAST(c.i AS DOUBLE)
                            / CAST(f.t_tot AS DOUBLE))) AS cc,
             SUM(c.xc * SIN(2.0 * {pi} * CAST(f.j AS DOUBLE)
                            * CAST(c.i AS DOUBLE)
                            / CAST(f.t_tot AS DOUBLE))) AS ss
      FROM cen c CROSS JOIN freqs f
      GROUP BY f.j, f.t_tot
    ),
    logi AS (
      SELECT t_tot,
             LN(cc * cc + ss * ss) AS ly,
             LN(4.0 * POW(SIN({pi} * CAST(j AS DOUBLE)
                              / CAST(t_tot AS DOUBLE)), 2.0)) AS lx
      FROM per WHERE cc * cc + ss * ss > 0
    ),
    agg AS (
      SELECT MAX(t_tot) AS n_obs,
             CAST(COUNT(*) AS BIGINT) AS m,
             SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
      FROM logi
    ),
    fit AS (
      SELECT n_obs, m,
             sxx - sx * sx / CAST(m AS DOUBLE) AS sxx_c,
             sxy - sx * sy / CAST(m AS DOUBLE) AS sxy_c
      FROM agg
    )
    SELECT n_obs,
           m AS m_freqs,
           ROUND(-(sxy_c / sxx_c), {round_to}) AS d_hat,
           ROUND(SQRT(({pi} * {pi} / 6.0) / sxx_c), {round_to})
             AS se_asymp,
           ROUND(-(sxy_c / sxx_c)
                 / SQRT(({pi} * {pi} / 6.0) / sxx_c), {round_to})
             AS t_stat
    FROM fit
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 162: TSB intermittent-demand forecast (obsolescence-safe Croston)
# ──────────────────────────────────────────────────────────────────────────


def tsb_forecast(
    demand: DataFrame,
    key_col: str = "item",
    day_col: str = "day",
    qty_col: str = "qty",
    alpha: float = 0.2,
    beta: float = 0.1,
    min_events: int = 3,
) -> DataFrame:
    """TSB method (Teunter, Syntetos & Babai 2011) — the
    obsolescence-safe fix to :func:`croston_forecast`: Croston only
    updates on demand days, so a part that DIED keeps its last rate
    forever; TSB smooths the demand PROBABILITY every period
    (p ← (1−β)p, +β on demand days) so a dead part's forecast decays
    toward zero, and keeps Croston's SES on nonzero sizes.

    The per-period probability recursion over zero days collapses to
    the closed form ``p·(1−β)^g`` for a g-day gap, so the fold still
    walks only the EVENT list (croston's sparsity-bounded shape) —
    never a densified calendar: a gap contributes
    ``exp(g·ln(1−β))`` with ln(1−β) precomputed HERE as one shared
    double literal, identical in both engines. The trailing zero run
    to the table's GLOBAL last day applies the same decay — that tail
    is exactly where obsolescence lives. Because exp() enters the
    chain (the one libm call), outputs are ROUNDed at 6dp — the
    croston no-rounding guarantee holds only for +/*-only folds.

    Output per key with ≥ ``min_events`` demand days: (key,
    n_demands, z_hat, p_hat, tsb_rate = p̂·ẑ), ordered by key.
    """
    a, b = float(alpha), float(beta)
    lnb = math.log(1.0 - b)  # shared literal, same double both engines
    per_day = demand.groupBy(
        F.col(key_col).alias("k"), F.col(day_col).alias("d")
    ).agg(F.sum(F.col(qty_col)).cast("bigint").alias("z"))
    bounds = per_day.agg(F.max("d").cast("bigint").alias("dmax"))
    series = (
        per_day.filter(F.col("z") > 0)
        .groupBy("k")
        .agg(
            F.sort_array(F.collect_list(F.struct("d", "z"))).alias("ev")
        )
        .filter(F.size("ev") >= min_events)
        .crossJoin(F.broadcast(bounds))
    )
    fold = F.expr(
        f"""
        aggregate(
          slice(ev, 2, greatest(size(ev) - 1, 0)),
          named_struct('pd', ev[0].d, 'z', cast(ev[0].z as double),
                       'p', cast(1.0 as double)),
          (acc, e) -> named_struct(
            'pd', e.d,
            'z', {a}D * e.z + {1 - a}D * acc.z,
            'p', {b}D + {1 - b}D
                 * (acc.p * exp(cast(e.d - acc.pd - 1 as double)
                                * {lnb!r}D))),
          acc -> named_struct(
            'z', acc.z,
            'p', acc.p * exp(cast(dmax - acc.pd as double) * {lnb!r}D)))
        """
    )
    out = series.select(
        F.col("k").alias(key_col),
        F.size("ev").cast("bigint").alias("n_demands"),
        fold.alias("__st"),
    )
    return out.select(
        key_col,
        "n_demands",
        F.round(F.col("__st.z"), 6).alias("z_hat"),
        F.round(F.col("__st.p"), 6).alias("p_hat"),
        F.round(F.col("__st.p") * F.col("__st.z"), 6).alias("tsb_rate"),
    ).orderBy(key_col)


def tsb_forecast_sql(
    demand_sql: str,
    key_col: str = "item",
    day_col: str = "day",
    qty_col: str = "qty",
    alpha: float = 0.2,
    beta: float = 0.1,
    min_events: int = 3,
) -> str:
    """DuckDB twin of :func:`tsb_forecast` — the same gap-closed-form
    recursion as a recursive CTE with the identical ln(1−β) literal."""
    a, b = float(alpha), float(beta)
    lnb = math.log(1.0 - b)
    return f"""
    WITH RECURSIVE src AS ({demand_sql}),
    per_day AS (
      SELECT {key_col} AS k, {day_col} AS d,
             CAST(SUM({qty_col}) AS BIGINT) AS z
      FROM src GROUP BY 1, 2
    ),
    bounds AS (SELECT CAST(MAX(d) AS BIGINT) AS dmax FROM per_day),
    ev AS (
      SELECT k, d, z,
             CAST(row_number() OVER (PARTITION BY k ORDER BY d)
                  AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS m
      FROM per_day WHERE z > 0
    ),
    keys AS (SELECT k, MAX(m) AS m FROM ev GROUP BY k
             HAVING MAX(m) >= {min_events}),
    rec AS (
      SELECT e.k, e.i, e.m, e.d AS pd, CAST(e.z AS DOUBLE) AS z,
             CAST(1.0 AS DOUBLE) AS p
      FROM ev e JOIN keys USING (k) WHERE e.i = 1
      UNION ALL
      SELECT r.k, e.i, r.m, e.d,
             {a!r} * e.z + {1 - a!r} * r.z,
             {b!r} + {1 - b!r}
               * (r.p * EXP(CAST(e.d - r.pd - 1 AS DOUBLE)
                            * {lnb!r}))
      FROM rec r JOIN ev e ON e.k = r.k AND e.i = r.i + 1
    ),
    last AS (
      SELECT r.k, r.m, r.z,
             r.p * EXP(CAST(b.dmax - r.pd AS DOUBLE) * {lnb!r}) AS p
      FROM rec r CROSS JOIN bounds b
      WHERE r.i = r.m
    )
    SELECT k AS {key_col},
           CAST(m AS BIGINT) AS n_demands,
           ROUND(z, 6) AS z_hat,
           ROUND(p, 6) AS p_hat,
           ROUND(p * z, 6) AS tsb_rate
    FROM last ORDER BY 1
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 166: Hotelling T² multivariate control chart
# ──────────────────────────────────────────────────────────────────────────

#: chi-square(2) 99th percentile — the classic Phase-II signal line
#: for a bivariate T² chart under the large-n approximation
_T2_CHI2_99 = 9.21034037197618


def hotelling_t2_chart(
    df: DataFrame,
    ts_col: str = "ts",
    event_a: str = "click",
    event_b: str = "purchase",
    round_to: int = 6,
) -> DataFrame:
    """Hotelling T² control chart over the daily (count_a, count_b)
    vector — the MULTIVARIATE upgrade of xmr_control_chart: two
    univariate charts miss exactly the days where clicks and
    purchases move in an UNUSUAL JOINT direction (e.g. clicks up,
    purchases down — each within its own band), which is what
    T² = (x−μ)' S⁻¹ (x−μ) is built to catch.

    Exactness: the scaled deviations u = n·x_t − Σx and the scaled
    centered moments A = nΣx²−(Σx)², B, C are EXACT (bigint /
    DECIMAL(38,0)) and cast to double exactly once; the closed-form
    2×2 inverse then gives

      T²_t = (n−1) · (B·u² − 2C·u·v + A·v²) / (n · (AB − C²))

    evaluated in double with identical shape in the twin — the
    products B·u² reach ~4e38 at 100× sf0.1, past ANY integer/decimal
    width, so the once-cast-double form is the scale-stable one, and
    T² is O(1..100) where 6dp rounding sits far above ulp noise. The
    signal line is the chi²(2) 99th percentile (large-n Phase-II
    convention, documented constant).

    One daily rollup, one 1-row moment broadcast, one scan of the
    days table. Output per day: (day, n_a, n_b, t2, signal), ordered
    by day.
    """
    day = F.col(ts_col).cast("date")
    daily = df.groupBy(day.alias("day")).agg(
        F.sum(F.when(F.col("event_type") == event_a, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == event_b, 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
    )
    j = daily.crossJoin(F.broadcast(mom))
    nD = F.col("n").cast(dec)
    aM = nD * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    bM = nD * F.col("syy") - F.col("sy").cast(dec) * F.col("sy").cast(dec)
    cM = nD * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    u = (F.col("n") * F.col("x") - F.col("sx")).cast("double")
    v = (F.col("n") * F.col("y") - F.col("sy")).cast("double")
    aD = aM.cast("double")
    bD = bM.cast("double")
    cD = cM.cast("double")
    quad = bD * u * u - 2.0 * cD * u * v + aD * v * v
    det = aD * bD - cD * cD
    t2 = (
        (F.col("n") - 1).cast("double")
        * quad
        / (F.col("n").cast("double") * det)
    )
    return j.select(
        "day",
        F.col("x").alias("n_a"),
        F.col("y").alias("n_b"),
        F.round(t2, round_to).alias("t2"),
        (t2 > _T2_CHI2_99).alias("signal"),
    ).orderBy("day")


def hotelling_t2_chart_sql(
    table: str = "events",
    ts_col: str = "ts",
    event_a: str = "click",
    event_b: str = "purchase",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`hotelling_t2_chart` (same exact-integer
    quadratic form, same chi²(2) line)."""
    return f"""
    WITH daily AS (
      SELECT CAST({ts_col} AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = '{event_a}' THEN 1
                      ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = '{event_b}' THEN 1
                      ELSE 0 END) AS BIGINT) AS y
      FROM {table} GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
               AS sxx,
             SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               AS syy,
             SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               AS sxy
      FROM daily
    ),
    casted AS (
      SELECT n, sx, sy,
             CAST(CAST(n AS DECIMAL(38,0)) * sxx
                  - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
                  AS DOUBLE) AS a,
             CAST(CAST(n AS DECIMAL(38,0)) * syy
                  - CAST(sy AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                  AS DOUBLE) AS b,
             CAST(CAST(n AS DECIMAL(38,0)) * sxy
                  - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                  AS DOUBLE) AS c
      FROM mom
    ),
    scored AS (
      SELECT d.day, d.x, d.y,
             (CAST(m.n - 1 AS DOUBLE)
              * (m.b * CAST(m.n * d.x - m.sx AS DOUBLE)
                     * CAST(m.n * d.x - m.sx AS DOUBLE)
                 - 2.0 * m.c * CAST(m.n * d.x - m.sx AS DOUBLE)
                       * CAST(m.n * d.y - m.sy AS DOUBLE)
                 + m.a * CAST(m.n * d.y - m.sy AS DOUBLE)
                       * CAST(m.n * d.y - m.sy AS DOUBLE))
              / (CAST(m.n AS DOUBLE) * (m.a * m.b - m.c * m.c)))
               AS t2
      FROM daily d CROSS JOIN casted m
    )
    SELECT day, x AS n_a, y AS n_b,
           ROUND(t2, {round_to}) AS t2,
           t2 > {_T2_CHI2_99!r} AS signal
    FROM scored ORDER BY day
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 172: negation-pattern funnel (A -> B with NO C between)
# ──────────────────────────────────────────────────────────────────────────


def negation_pattern_funnel(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    start_event: str = "click",
    goal_event: str = "purchase",
    blocker_event: str = "error",
    window_minutes: int = 30,
    round_to: int = 6,
) -> DataFrame:
    """Sequence pattern with NEGATION — the MATCH_RECOGNIZE exclusion
    clause the window-function funnels in this suite
    (funnel_conversion, event_transition_matrix, paths_to_purchase)
    cannot express: ``start → goal within W, with NO blocker event
    strictly between them``. "Did the click convert cleanly, or did
    an error interpose?" is a different business question from "did
    it convert" — the blocked share IS the reliability cost.

    No joins anywhere: one per-user window ordered by time computes,
    for every start event, the NEXT goal timestamp and the NEXT
    blocker timestamp (conditional MIN over the strictly-following
    frame); the pattern decides per row —

      clean   : next_goal ≤ t + W  and (no blocker or blocker AFTER
                the goal);
      blocked : next_goal ≤ t + W  but a blocker lands between;
      expired : no goal within W.

    Timestamps are exact microsecond integers; counts are exact; one
    shuffle (the user window), one 1-row rollup. Ties: a blocker at
    EXACTLY the goal timestamp does not block (strictly-between
    contract, documented and pinned).

    Output (one row): (n_starts, n_clean, n_blocked, n_expired,
    clean_rate, blocked_rate).
    """
    w_us = int(window_minutes) * 60_000_000
    t = F.unix_micros(F.col(ts_col))
    # ROWS frames under a tied ORDER BY are frame-order-dependent, so
    # ties break on (t, event) — a total order both engines share
    wfol = (
        Window.partitionBy(user_col)
        .orderBy(F.col("__t").asc(), F.col("__e").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    typed = df.select(
        F.col(user_col),
        t.alias("__t"),
        F.col("event_type").alias("__e"),
    ).select(
        "*",
        F.min(
            F.when(F.col("__e") == goal_event, F.col("__t"))
        ).over(wfol).alias("__ng"),
        F.min(
            F.when(F.col("__e") == blocker_event, F.col("__t"))
        ).over(wfol).alias("__nb"),
    )
    starts = typed.filter(F.col("__e") == start_event)
    in_window = F.col("__ng").isNotNull() & (
        F.col("__ng") <= F.col("__t") + F.lit(w_us)
    )
    blocked = in_window & F.col("__nb").isNotNull() & (
        F.col("__nb") < F.col("__ng")
    )
    clean = in_window & ~(
        F.col("__nb").isNotNull() & (F.col("__nb") < F.col("__ng"))
    )
    agg = starts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_starts"),
        F.sum(clean.cast("long")).cast("bigint").alias("n_clean"),
        F.sum(blocked.cast("long")).cast("bigint").alias("n_blocked"),
        F.sum((~in_window).cast("long")).cast("bigint").alias(
            "n_expired"
        ),
    )
    nn = F.col("n_starts").cast("double")
    return agg.select(
        "n_starts",
        "n_clean",
        "n_blocked",
        "n_expired",
        F.round(F.col("n_clean") / nn, round_to).alias("clean_rate"),
        F.round(F.col("n_blocked") / nn, round_to).alias(
            "blocked_rate"
        ),
    )


def negation_pattern_funnel_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    start_event: str = "click",
    goal_event: str = "purchase",
    blocker_event: str = "error",
    window_minutes: int = 30,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`negation_pattern_funnel`."""
    w_us = int(window_minutes) * 60_000_000
    return f"""
    WITH typed AS (
      SELECT {user_col} AS u, epoch_us({ts_col}) AS t,
             event_type AS e
      FROM {table}
    ),
    scanned AS (
      SELECT u, t, e,
             MIN(CASE WHEN e = '{goal_event}' THEN t END)
               OVER (PARTITION BY u ORDER BY t, e
                     ROWS BETWEEN 1 FOLLOWING
                     AND UNBOUNDED FOLLOWING) AS ng,
             MIN(CASE WHEN e = '{blocker_event}' THEN t END)
               OVER (PARTITION BY u ORDER BY t, e
                     ROWS BETWEEN 1 FOLLOWING
                     AND UNBOUNDED FOLLOWING) AS nb
      FROM typed
    ),
    starts AS (SELECT * FROM scanned WHERE e = '{start_event}'),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_starts,
             CAST(SUM(CASE WHEN ng IS NOT NULL AND ng <= t + {w_us}
                           AND NOT (nb IS NOT NULL AND nb < ng)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
             CAST(SUM(CASE WHEN ng IS NOT NULL AND ng <= t + {w_us}
                           AND nb IS NOT NULL AND nb < ng
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
             CAST(SUM(CASE WHEN ng IS NULL OR ng > t + {w_us}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_expired
      FROM starts
    )
    SELECT n_starts, n_clean, n_blocked, n_expired,
           ROUND(CAST(n_clean AS DOUBLE) / CAST(n_starts AS DOUBLE),
                 {round_to}) AS clean_rate,
           ROUND(CAST(n_blocked AS DOUBLE) / CAST(n_starts AS DOUBLE),
                 {round_to}) AS blocked_rate
    FROM agg
    """
