"""Flagship analytical query (SURVEY.md §2.4 A2, §3.4).

Reproduces the exact relational shape of the reference's flagship query
``dashboard/sql/get_school_analysis_data.sql:1-28``:

    base dim table
      LEFT JOIN member lookup             (J3, sql:15-16)
      INNER JOIN pre-aggregated subquery  (J4, sql:17-27)
    GROUP BY dim keys                      (A2, sql:28)
      with AVG(...)xN, SUM(...)xN,
      STRING_AGG(DISTINCT x, ', '), STRING_AGG(y, ', ')

re-targeted at the star schema: nation stands in for school_district,
customer for district_town_lookup (nation -> member customers), orders
for election_result (per-member fact rows, pre-aggregated in a derived
table before the join, exactly like the sql:18-26 subquery).

Intentional tightening (SURVEY §7.4): Postgres STRING_AGG without ORDER
BY is order-nondeterministic; we sort (array_sort over collect_set /
collect_list) so results are reproducible and oracle-checkable.

Scale notes:
  * orders is pre-aggregated to one row per custkey BEFORE the join —
    the shuffle moves |customers| rows, not |orders| rows.
  * the final groupBy shuffles on the nation key; partial aggregation
    (map-side combine) applies to every agg here including collect_set.
  * at testdata scale AQE converts both joins to broadcast; at 100 TB
    the same plan degrades gracefully to sort-merge with skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.aggregates import MONEY, money_avg, money_sum


def flagship_school_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame form of the flagship query.

    Money aggregates use exact DECIMAL(18,2) sums (see
    operators.aggregates.MONEY) so results are order-independent —
    reproducible across partitionings and bit-identical to the oracle.
    """
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    # sql:17-27 — derived-table pre-aggregate (J4's right side); the sum
    # stays DECIMAL through the join so the outer re-aggregate is exact too
    cust_orders = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(MONEY)).alias("member_totalprice"),
        F.count(F.lit(1)).alias("n_orders"),
    )

    return (
        nation
        # sql:15-16 — LEFT JOIN lookup (J3)
        .join(customer, nation["n_nationkey"] == customer["c_nationkey"], "left")
        # sql:17,27 — INNER JOIN pre-aggregated subquery (J4)
        .join(cust_orders, F.col("c_custkey") == F.col("o_custkey"), "inner")
        # sql:1-14,28 — two-level aggregation (A2)
        .groupBy("n_nationkey", "n_name")
        .agg(
            money_avg("c_acctbal").alias("avg_acctbal"),
            (F.sum("member_totalprice").cast("double") / F.count("member_totalprice")).alias(
                "avg_member_totalprice"
            ),
            F.sum("member_totalprice").cast("double").alias("sum_totalprice"),
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.count(F.lit(1)).alias("n_customers"),
            # STRING_AGG(DISTINCT county, ', ') — sorted for determinism
            F.concat_ws(", ", F.array_sort(F.collect_set("c_mktsegment"))).alias(
                "mktsegments"
            ),
            # STRING_AGG(town, ', ') — sorted for determinism
            F.concat_ws(", ", F.array_sort(F.collect_list("c_name"))).alias(
                "customer_names"
            ),
        )
    )


FLAGSHIP_ORACLE_SQL = """
SELECT
    n.n_nationkey,
    n.n_name,
    CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c.c_acctbal)
        AS avg_acctbal,
    CAST(SUM(co.member_totalprice) AS DOUBLE) / COUNT(co.member_totalprice)
        AS avg_member_totalprice,
    CAST(SUM(co.member_totalprice) AS DOUBLE) AS sum_totalprice,
    CAST(SUM(co.n_orders) AS BIGINT) AS n_orders,
    COUNT(*) AS n_customers,
    string_agg(DISTINCT c.c_mktsegment, ', ' ORDER BY c.c_mktsegment) AS mktsegments,
    string_agg(c.c_name, ', ' ORDER BY c.c_name) AS customer_names
FROM nation n
LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
INNER JOIN (
    SELECT o_custkey,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS member_totalprice,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
) co ON c.c_custkey = co.o_custkey
GROUP BY n.n_nationkey, n.n_name
"""
