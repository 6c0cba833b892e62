"""Wave-48 extension specs: Hamilton apportionment, XmR control
chart, shipping SLA, shift-share decomposition, percent-of-parent
rollup.

Reference scope: apportionment extends the reference's election
surface (election_results_etl.py computes vote shares; allocation is
the canonical downstream step); the rest have no analogue
(SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import apportion, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "largest_remainder_seats",
    apportion.largest_remainder_seats_sql("customer", "c_nationkey", 120),
    "election op — Hamilton largest-remainder apportionment of 120 "
    "seats by customer nation: ALL-integer quotas ((v*S) div T / mod "
    "T — no float quota boundary), deterministic remainder ranking "
    "over the party-sized table; total seats sum exactly to S. "
    "Extends election_results_etl.py's vote-share surface.",
)
def largest_remainder_seats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return apportion.largest_remainder_seats(cust, "c_nationkey", 120)


@_spec(
    "xmr_control_chart",
    timeseries.xmr_control_chart_sql(),
    "ops op — Shewhart XmR individuals chart over per-type daily "
    "counts: exact integer moving ranges, one fixed IEEE limit "
    "expression (identical both engines), exact-integer-vs-limit "
    "violation counts; daily rollup + one lag window.",
)
def xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.xmr_control_chart(events)


@_spec(
    "shipping_sla_report",
    """
    WITH j AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within_30d,
           CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS sla_30d,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag_days
    FROM j GROUP BY priority
    """,
    "SLA op — per-priority shipping latency: integer datediff lag, "
    "exact within-30d counts, single-division SLA ratio; one "
    "order-key join + priority rollup.",
)
def shipping_sla_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    j = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"), lag.alias("lag_days")
    )
    return j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum((F.col("lag_days") <= 30).cast("bigint"))
        .cast("bigint")
        .alias("n_within_30d"),
        (
            F.sum((F.col("lag_days") <= 30).cast("bigint")).cast("double")
            / F.count(F.lit(1))
        ).alias("sla_30d"),
        F.max("lag_days").cast("bigint").alias("max_lag_days"),
    )


@_spec(
    "shift_share_events",
    """
    WITH span AS (
      SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM events
    ),
    halves AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN epoch_us(ts) - (SELECT epoch_us(t0) FROM span)
                       < ((SELECT epoch_us(t1) FROM span)
                          - (SELECT epoch_us(t0) FROM span)) // 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS h1,
             CAST(SUM(CASE WHEN epoch_us(ts) - (SELECT epoch_us(t0) FROM span)
                       < ((SELECT epoch_us(t1) FROM span)
                          - (SELECT epoch_us(t0) FROM span)) // 2
                       THEN 0 ELSE 1 END) AS BIGINT) AS h2
      FROM events GROUP BY event_type
    ),
    nat AS (SELECT CAST(SUM(h1) AS BIGINT) AS N1, CAST(SUM(h2) AS BIGINT) AS N2
            FROM halves)
    SELECT h.event_type, h.h1, h.h2,
           h.h2 - h.h1 AS total_shift,
           h.h1 * (CAST(nat.N2 AS DOUBLE) / nat.N1 - 1) AS national_effect,
           (h.h2 - h.h1) - h.h1 * (CAST(nat.N2 AS DOUBLE) / nat.N1 - 1)
             AS competitive_effect
    FROM halves h CROSS JOIN nat
    """,
    "econ op — shift-share decomposition of event-type growth "
    "between the corpus's two time halves: each type's change splits "
    "into the national-growth effect and the competitive residual; "
    "exact integer half-counts (integer-micros midpoint), single "
    "IEEE effect expressions; one scan + type rollup.",
)
def shift_share_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    span = events.agg(
        F.min(F.unix_micros("ts")).alias("__t0"),
        F.max(F.unix_micros("ts")).alias("__t1"),
    )
    tagged = events.crossJoin(F.broadcast(span)).select(
        "event_type",
        (
            F.unix_micros("ts") - F.col("__t0")
            < F.expr("(__t1 - __t0) div 2")
        ).cast("int").alias("__in_h1"),
    )
    halves = tagged.groupBy("event_type").agg(
        F.sum("__in_h1").cast("bigint").alias("h1"),
        F.sum(1 - F.col("__in_h1")).cast("bigint").alias("h2"),
    )
    nat = halves.agg(
        F.sum("h1").cast("bigint").alias("__N1"),
        F.sum("h2").cast("bigint").alias("__N2"),
    )
    g = F.col("__N2").cast("double") / F.col("__N1") - 1
    return halves.crossJoin(F.broadcast(nat)).select(
        "event_type",
        "h1",
        "h2",
        (F.col("h2") - F.col("h1")).alias("total_shift"),
        (F.col("h1") * g).alias("national_effect"),
        ((F.col("h2") - F.col("h1")) - F.col("h1") * g).alias(
            "competitive_effect"
        ),
    )


@_spec(
    "pct_of_parent_rollup",
    """
    WITH cust_rev AS (
      SELECT c.c_nationkey, CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                                 AS DECIMAL(38,2)) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey
    ),
    nation_rev AS (
      SELECT n.n_regionkey, n.n_nationkey, n.n_name, cr.rev
      FROM cust_rev cr JOIN nation n ON n.n_nationkey = cr.c_nationkey
    ),
    region_rev AS (
      SELECT n_regionkey, CAST(SUM(rev) AS DECIMAL(38,2)) AS region_rev
      FROM nation_rev GROUP BY n_regionkey
    ),
    grand AS (SELECT CAST(SUM(rev) AS DECIMAL(38,2)) AS grand_rev
              FROM nation_rev)
    SELECT nr.n_regionkey, nr.n_nationkey, nr.n_name,
           CAST(nr.rev AS DOUBLE) AS revenue,
           CAST(nr.rev AS DOUBLE) / CAST(rr.region_rev AS DOUBLE)
             AS pct_of_region,
           CAST(nr.rev AS DOUBLE) / CAST(g.grand_rev AS DOUBLE) AS pct_of_total
    FROM nation_rev nr
    JOIN region_rev rr ON rr.n_regionkey = nr.n_regionkey
    CROSS JOIN grand g
    """,
    "BI op — percent-of-parent hierarchy rollup (nation -> region -> "
    "grand total of order revenue): decimal-exact sums at every "
    "grain, parent totals derive from the child table (one corpus "
    "aggregation), single-division shares; broadcast dimension "
    "joins.",
)
def pct_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust_rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("__rev")
        )
    )
    nation_rev = cust_rev.join(
        F.broadcast(nation.select("n_nationkey", "n_regionkey", "n_name")),
        cust_rev["c_nationkey"] == F.col("n_nationkey"),
    )
    region_rev = nation_rev.groupBy("n_regionkey").agg(
        F.sum("__rev").cast("decimal(38,2)").alias("__region_rev")
    )
    grand = nation_rev.agg(
        F.sum("__rev").cast("decimal(38,2)").alias("__grand_rev")
    )
    return (
        nation_rev.join(F.broadcast(region_rev), "n_regionkey")
        .crossJoin(F.broadcast(grand))
        .select(
            "n_regionkey",
            "n_nationkey",
            "n_name",
            F.col("__rev").cast("double").alias("revenue"),
            (
                F.col("__rev").cast("double")
                / F.col("__region_rev").cast("double")
            ).alias("pct_of_region"),
            (
                F.col("__rev").cast("double")
                / F.col("__grand_rev").cast("double")
            ).alias("pct_of_total"),
        )
    )
