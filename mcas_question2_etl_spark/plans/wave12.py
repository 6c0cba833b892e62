"""Wave-12 extension spec: nested-type processing — array-of-structs
construction + higher-order functions, the complex-type toolkit a
lakehouse schema (order with line-item array, doc with chunk array)
exercises constantly and flat relational specs never touch.

Determinism: collect_list is partition-order-nondeterministic, so the
struct array is canonicalized with ``sort_array`` (struct fields
ordered (price, linenumber) to make the sort a unique total order);
every folded quantity is integer arithmetic, so the oracle matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "order_items_nested_ops",
    """
    WITH nested AS (
      SELECT l_orderkey,
             list({'price': l_extendedprice, 'ln': l_linenumber,
                   'partkey': l_partkey, 'qty': l_quantity}
                  ORDER BY l_extendedprice, l_linenumber) AS items
      FROM lineitem GROUP BY 1
    ),
    per_order AS (
      SELECT n.l_orderkey, o.o_orderpriority,
             len(n.items) AS n_items,
             n.items[-1].partkey AS top_partkey,
             n.items[-1].qty AS top_qty,
             list_sum(list_transform(n.items,
                                     x -> CAST(x.qty AS BIGINT)))
               AS total_qty
      FROM nested n JOIN orders o ON n.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_items) AS BIGINT) AS total_items,
           CAST(SUM(total_qty) AS BIGINT) AS total_qty,
           CAST(SUM(CASE WHEN top_qty > 25 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top_item_bulk,
           CAST(SUM(top_partkey) AS BIGINT) AS sum_top_partkey
    FROM per_order GROUP BY 1 ORDER BY 1
    """,
    "extension — nested-type toolkit: per-order line items collected "
    "into a SORTED array of structs (the lakehouse order document "
    "shape), then processed entirely with higher-order array "
    "functions — element_at(-1) for the priciest item, transform + "
    "aggregate for an integer fold — inside the same stage as the "
    "collect, no second shuffle and no explode-rejoin round trip. "
    "sort_array over (price, linenumber) structs makes the "
    "nondeterministic collect_list canonical; every folded measure is "
    "integer-exact",
)
def order_items_nested_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_extendedprice").alias("price"),
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_partkey").alias("partkey"),
                    F.col("l_quantity").alias("qty"),
                )
            )
        ).alias("items")
    )
    top = F.element_at("items", -1)
    per_order = nested.join(
        orders, nested.l_orderkey == orders.o_orderkey
    ).select(
        "o_orderpriority",
        F.size("items").alias("n_items"),
        top.getField("partkey").alias("top_partkey"),
        top.getField("qty").alias("top_qty"),
        F.expr(
            "aggregate(transform(items, x -> cast(x.qty as bigint)), "
            "0L, (a, x) -> a + x)"
        ).alias("total_qty"),
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").cast("long").alias("total_items"),
            F.sum("total_qty").cast("long").alias("total_qty"),
            F.sum((F.col("top_qty") > 25).cast("int"))
            .cast("long")
            .alias("n_top_item_bulk"),
            F.sum("top_partkey").cast("long").alias("sum_top_partkey"),
        )
        .orderBy("o_orderpriority")
    )
