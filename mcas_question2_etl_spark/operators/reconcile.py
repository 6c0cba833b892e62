"""Cross-table financial reconciliation and duplicate-transaction
audits.

The two bread-and-butter finance/data-quality checks every warehouse
runs nightly: (1) does the order header total equal the recomputed
sum of its lines, and (2) are there suspicious same-customer
same-amount same-day transaction groups (double-billing / double-load
tripwire).

Determinism discipline: all money flows through DECIMAL —
extendedprice/discount/tax are 2-decimal measures, so the per-line
``price * (1 - disc) * (1 + tax)`` is DECIMAL-exact at scale 6 and
the per-order sum is order-free; the header comparison and the
magnitude bucketing are decimal compares, so no boundary order can
flip engines. Duplicate grouping keys on the exact decimal amount,
never the raw double.

Scale shape: reconciliation is one lineitem aggregation to order
grain + one join to headers on the order key (both sides shuffle once
on the same key) + a 4-row bucket rollup. The duplicate audit is one
groupBy on (customer, amount, day) + a multiplicity histogram over
the GROUP table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M = "decimal(18,2)"


def order_total_reconciliation(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """(bucket, n_orders, total_abs_diff) with buckets 'exact'
    (diff = 0), 'lt_1' (0 < |diff| < 1), 'gte_1', and 'no_lines'
    (header without any line)."""
    per_line = (
        F.col("l_extendedprice").cast(_M)
        * (F.lit(1).cast(_M) - F.col("l_discount").cast(_M))
        * (F.lit(1).cast(_M) + F.col("l_tax").cast(_M))
    )
    recomputed = lineitem.groupBy("l_orderkey").agg(
        F.sum(per_line).alias("__recomp")
    )
    joined = orders.select(
        "o_orderkey", F.col("o_totalprice").cast(_M).alias("__hdr")
    ).join(recomputed, orders["o_orderkey"] == recomputed["l_orderkey"], "left")
    diff = F.col("__hdr") - F.col("__recomp")
    one = F.lit(1).cast(_M)
    bucketed = joined.select(
        F.when(F.col("__recomp").isNull(), F.lit("no_lines"))
        .when(diff == 0, F.lit("exact"))
        .when(F.abs(diff) < one, F.lit("lt_1"))
        .otherwise(F.lit("gte_1"))
        .alias("bucket"),
        F.coalesce(F.abs(diff), F.lit(0).cast(_M)).alias("__ad"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("__ad").cast("double").alias("total_abs_diff"),
    )


def order_total_reconciliation_sql(
    orders: str = "orders", lineitem: str = "lineitem"
) -> str:
    """DuckDB twin of :func:`order_total_reconciliation`."""
    return f"""
    WITH rc AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
               AS recomp
      FROM {lineitem} GROUP BY l_orderkey
    ),
    j AS (
      SELECT CAST(o.o_totalprice AS DECIMAL(18,2)) AS hdr, rc.recomp
      FROM {orders} o LEFT JOIN rc ON rc.l_orderkey = o.o_orderkey
    ),
    b AS (
      SELECT CASE WHEN recomp IS NULL THEN 'no_lines'
                  WHEN hdr - recomp = 0 THEN 'exact'
                  WHEN abs(hdr - recomp) < CAST(1 AS DECIMAL(18,2)) THEN 'lt_1'
                  ELSE 'gte_1' END AS bucket,
             COALESCE(abs(hdr - recomp), CAST(0 AS DECIMAL(18,2))) AS ad
      FROM j
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(ad) AS DOUBLE) AS total_abs_diff
    FROM b GROUP BY bucket
    """


def duplicate_transaction_audit(
    df: DataFrame,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    ts_col: str = "o_orderdate",
) -> DataFrame:
    """(multiplicity, n_groups, n_rows) — histogram of (customer,
    exact-decimal amount, calendar day) groups by how many
    transactions they contain; multiplicity >= 2 is the double-charge
    candidate set."""
    groups = df.groupBy(
        F.col(key_col),
        F.col(amount_col).cast(_M).alias("__amt"),
        F.col(ts_col).cast("date").alias("__day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__k"))
    return (
        groups.groupBy(F.col("__k").alias("multiplicity"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("__k").cast("bigint").alias("n_rows"),
        )
    )


def duplicate_transaction_audit_sql(
    table: str = "orders",
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    ts_col: str = "o_orderdate",
) -> str:
    """DuckDB twin of :func:`duplicate_transaction_audit`."""
    return f"""
    WITH g AS (
      SELECT {key_col}, CAST({amount_col} AS DECIMAL(18,2)) AS amt,
             CAST({ts_col} AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS k
      FROM {table} GROUP BY 1, 2, 3
    )
    SELECT k AS multiplicity,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows
    FROM g GROUP BY k
    """
