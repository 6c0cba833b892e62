"""TPC-H-shaped benchmark queries (Q3/Q5/Q10/Q18 adapted to the
testdata's column subset) — the classic multi-join + aggregation
workload, included to demonstrate plan quality at scale:

  * dimension sides broadcast (region/nation/supplier; AQE confirms at
    runtime), fact tables never shuffled before their filters;
  * date + segment predicates push into the parquet scans;
  * revenue is the exact-DECIMAL product sum (operators/aggregates.py
    revenue_sum), so results are engine- and partitioning-identical;
  * top-k via orderBy+limit compiles to TakeOrderedAndProject — a
    per-partition heap + k-row driver merge, not a global sort.

pricing_summary (plans/relational.py) already covers the Q1 shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.aggregates import money_sum, oracle_money_sum, oracle_revenue_sum, revenue_sum
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_REV = oracle_revenue_sum("l_extendedprice", "l_discount")


@_spec(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l.l_orderkey, {_REV} AS revenue, o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape (o_shippriority -> o_orderpriority): "
    "filter-pushdown on both fact scans, customer join, grouped "
    "revenue, top-10 via TakeOrdered",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(
            orders.filter(F.col("o_orderdate") < "1998-01-01"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            lineitem.filter(F.col("l_shipdate") > "1998-01-01"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_sum().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_spec(
    "tpch_q5_local_supplier_volume",
    f"""
    SELECT n.n_name, {_REV} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    "TPC-H Q5: 6-table star join with the 'local supplier' "
    "(c_nationkey = s_nationkey) constraint; region/nation/supplier "
    "broadcast, facts filtered before joining",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem, supplier, nation, region = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    dims = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(dims),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(revenue_sum().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@_spec(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, {_REV} AS revenue, c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    "TPC-H Q10: returned-item revenue per customer, one quarter; "
    "returnflag + date predicates pushed, nation broadcast, top-20",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem, nation = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "nation")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .join(
            lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_sum().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_spec(
    "tpch_q18_large_volume_customer",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    "TPC-H Q18: large-volume customers via IN-subquery on a grouped "
    "HAVING — compiles to an aggregate + left-semi join; quantity sums "
    "are whole numbers stored as doubles, so SUM is exact",
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(
            big_orders.withColumnRenamed("l_orderkey", "o_orderkey"),
            "o_orderkey",
            "leftsemi",
        )
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias(
                "o_totalprice"
            ),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
