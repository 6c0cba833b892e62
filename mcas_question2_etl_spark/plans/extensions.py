"""Relational extensions beyond the reference's surface — operators the
reference never needed but a user scaling it up reaches for immediately
(SURVEY §2.4/§2.8 'not present, free in Spark' notes): rollup,
semi/anti joins, HAVING, lag/lead windows, and the as-of join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import aggregates
from ..operators.asof import asof_join
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "rollup_totals",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "extension — ROLLUP hierarchy totals (SURVEY §2.4 'not present' "
    "note); one shuffle, grouping-set expansion map-side",
)
def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        aggregates.money_sum("o_totalprice").alias("sum_totalprice"),
        F.count(F.lit(1)).alias("n"),
    )


@_spec(
    "join_semi_anti",
    """
    SELECT 'with_orders' AS segment, c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'no_orders' AS segment, c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "extension — left-semi / left-anti joins (SURVEY §2.3 'not present' "
    "note); both sides one broadcast/shuffled hash join, no row blowup",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    semi = cust.join(orders, "c_custkey", "leftsemi").select(
        F.lit("with_orders").alias("segment"), "c_custkey", "c_name"
    )
    anti = cust.join(orders, "c_custkey", "leftanti").select(
        F.lit("no_orders").alias("segment"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


@_spec(
    "having_filter",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    "extension — HAVING post-aggregate filter (SURVEY §2.4 'not "
    "present' note)",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            aggregates.money_sum("o_totalprice").alias("sum_totalprice"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@_spec(
    "window_lag_lead",
    """
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice) OVER w AS prev_totalprice,
           lead(o_totalprice) OVER w AS next_totalprice
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "extension — lag/lead order history (SURVEY §2.5 'no lag/lead' "
    "note); one shuffle on the partition key",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_totalprice"),
        F.lead("o_totalprice").over(w).alias("next_totalprice"),
    )


@_spec(
    "asof_join_click_purchase",
    """
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           p.event_id AS purchase_event_id,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    "extension — as-of join (operators/asof.py union+window technique "
    "vs DuckDB's native ASOF JOIN): most recent purchase at/before "
    "each click, per user",
)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    joined = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["purchase_event_id", "purchase_value"],
        tiebreak="purchase_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "purchase_event_id",
        "purchase_value",
    )
