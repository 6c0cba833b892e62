"""Wave-60 extension specs: price elasticity by brand, funnel window
sensitivity, quarterly spend Gini, day-hour activity heatmap.

Reference scope: beyond-reference econ/BI analytics (SURVEY §2.13);
the elasticity spec composes the existing group_ols machinery, the
Gini trend extends the concentration family over time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import concentration, regression
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_ELASTICITY_PTS_SQL = """(
  SELECT part.p_brand,
         ln(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)) AS lx,
         ln(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)) AS ly
  FROM lineitem JOIN part ON part.p_partkey = lineitem.l_partkey
  GROUP BY lineitem.l_partkey, part.p_brand
) pts"""


@_spec(
    "price_elasticity_by_brand",
    regression.group_ols_oracle_sql(_ELASTICITY_PTS_SQL, ["p_brand"], "lx", "ly"),
    "econ op — log-log demand elasticity per brand: per-part "
    "(ln unit price, ln total quantity) points from DECIMAL-exact "
    "spend/quantity sums, then the repo's sufficient-statistics "
    "group OLS (slope = elasticity, rounded per its oracle "
    "discipline).",
)
def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pts = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("__sp"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("__sq"),
        )
        .select(
            "p_brand",
            F.log(F.col("__sp") / F.col("__sq").cast("double")).alias("lx"),
            F.log(F.col("__sq").cast("double")).alias("ly"),
        )
    )
    fit = regression.group_ols(pts, ["p_brand"], "lx", "ly")
    return fit.select(
        "p_brand",
        "n",
        F.round("slope", 4).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 4).alias("r2"),
    )


@_spec(
    "funnel_window_sensitivity",
    """
    WITH first_click AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t0
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    purchases AS (
      SELECT user_id, epoch_us(ts) AS tp
      FROM events WHERE event_type = 'purchase'
    ),
    wins AS (SELECT unnest([1, 24, 72]) AS w),
    conv AS (
      SELECT wins.w, first_click.user_id,
             CAST(MAX(CASE WHEN purchases.tp >= first_click.t0
                            AND purchases.tp < first_click.t0
                                + w * CAST(3600000000 AS BIGINT)
                           THEN 1 ELSE 0 END) AS INTEGER) AS c
      FROM first_click
      CROSS JOIN wins
      LEFT JOIN purchases ON purchases.user_id = first_click.user_id
      GROUP BY wins.w, first_click.user_id
    )
    SELECT CAST(w AS BIGINT) AS window_hours,
           CAST(COUNT(*) AS BIGINT) AS n_clickers,
           CAST(SUM(c) AS BIGINT) AS n_converted,
           CAST(SUM(c) AS DOUBLE) / COUNT(*) AS conversion_rate
    FROM conv GROUP BY w
    """,
    "funnel op — conversion-window sensitivity: first-click to "
    "purchase conversion at 1/24/72h attribution windows in one "
    "pass (exact integer-micros comparisons); shows how much the "
    "window choice moves the headline rate.",
)
def funnel_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t0"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("tp")
    )
    wins = F.explode(F.array(F.lit(1), F.lit(24), F.lit(72))).alias("w")
    conv = (
        first_click.select("user_id", "t0", wins)
        .join(purchases, "user_id", "left")
        .groupBy("w", "user_id")
        .agg(
            F.max(
                (
                    (F.col("tp") >= F.col("t0"))
                    & (
                        F.col("tp")
                        < F.col("t0")
                        + F.col("w") * F.lit(3600000000).cast("bigint")
                    )
                ).cast("int")
            ).alias("c")
        )
        .na.fill({"c": 0})
    )
    return conv.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clickers"),
        F.sum("c").cast("bigint").alias("n_converted"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias(
            "conversion_rate"
        ),
    ).select(
        F.col("w").cast("bigint").alias("window_hours"),
        "n_clickers",
        "n_converted",
        "conversion_rate",
    )


@_spec(
    "spend_gini_by_quarter",
    concentration.gini_by_period_sql(
        "SELECT o_custkey, o_orderdate, o_totalprice FROM orders",
        "CAST(year(o_orderdate) * 10 + quarter(o_orderdate) AS BIGINT)",
        "o_custkey",
        "o_totalprice",
    ),
    "inequality op — Gini of per-customer spend per quarter: "
    "DECIMAL-exact spends and rank-weighted sums, period-partitioned "
    "rank windows (no global sort), fixed IEEE Gini expression with "
    "zero rounding; the concentration TREND view.",
)
def spend_gini_by_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    period = (F.year("o_orderdate") * 10 + F.quarter("o_orderdate")).cast(
        "bigint"
    )
    return concentration.gini_by_period(
        orders, period, "o_custkey", "o_totalprice"
    )


@_spec(
    "dow_hour_heatmap",
    """
    WITH cells AS (
      SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS INTEGER) AS dow,
             CAST(hour(ts) AS INTEGER) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS t
      FROM cells GROUP BY event_type
    )
    SELECT cells.event_type, cells.dow, cells.hod, cells.n,
           CAST(cells.n AS DOUBLE) / tot.t AS share
    FROM cells JOIN tot ON tot.event_type = cells.event_type
    """,
    "BI op — (ISO weekday x hour) activity heatmap per event type "
    "with within-type share: exact integer cells, portable weekday/"
    "hour extraction, one division.",
)
def dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        ((F.dayofweek(F.col("ts").cast("date")) + 5) % 7 + 1)
        .cast("int")
        .alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cells.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("t")
    )
    return cells.join(tot, "event_type").select(
        "event_type",
        "dow",
        "hod",
        "n",
        (F.col("n").cast("double") / F.col("t")).alias("share"),
    )
