"""RFM (recency / frequency / monetary) customer segmentation.

The classic marketing-analytics segmentation: per customer, days
since last order (recency), order count (frequency), and lifetime
spend (monetary), each scored into quintiles where 5 = best
(most recent / most frequent / highest spend), then customers
aggregated per 3-digit segment.

Determinism discipline: recency is integer ``datediff`` days against
a broadcast global horizon; monetary is an exact DECIMAL(18,2) sum
(order-free). Quintile scores use SQL NTILE semantics over a UNIQUE
total order — each ordering ends with the customer key, so bucket
boundaries cannot depend on partition layout — and the Spark side
builds NTILE from the distributed two-phase global rank
(:mod:`.ranking`), never a single-task unpartitioned window. The
per-segment average spend divides the exact decimal sum by the count.

Scale shape: one groupBy shuffle reduces orders to one row per
customer; each score is a range shuffle of the per-customer table
(the :func:`with_ntile` construction); the final segment rollup is a
125-group aggregate with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranking import with_ntile

_MONEY = "decimal(18,2)"


def rfm_segments(
    df: DataFrame,
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """(segment, r_score, f_score, m_score, n_customers, avg_monetary)
    with quintile scores 1..5, 5 = best."""
    per_cust = df.groupBy(cust_col).agg(
        F.max(F.col(ts_col).cast("date")).alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("__freq"),
        F.sum(F.col(amount_col).cast(_MONEY)).alias("__mon"),
    )
    horizon = df.agg(F.max(F.col(ts_col).cast("date")).alias("__hz"))
    rfm = per_cust.crossJoin(F.broadcast(horizon)).select(
        F.col(cust_col).alias("__ck"),
        F.datediff("__hz", "__last").cast("bigint").alias("__rec"),
        "__freq",
        "__mon",
    )
    # NTILE ascending gives bucket 1 to the smallest key; "best" must
    # land in bucket 5, so recency (smaller = better) orders DESCENDING
    # while frequency/monetary order ascending. Customer key breaks
    # every tie to a unique total order.
    scored = with_ntile(
        rfm, [F.col("__rec").desc(), F.col("__ck")], 5, out_col="r_score"
    )
    scored = with_ntile(
        scored, [F.col("__freq"), F.col("__ck")], 5, out_col="f_score"
    )
    scored = with_ntile(
        scored, [F.col("__mon"), F.col("__ck")], 5, out_col="m_score"
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (F.sum("__mon").cast("double") / F.count(F.lit(1))).alias(
                "avg_monetary"
            ),
        )
        .select(
            F.concat_ws(
                "", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ).alias("segment"),
            "r_score",
            "f_score",
            "m_score",
            "n_customers",
            "avg_monetary",
        )
    )


def rfm_segments_sql(
    table: str = "orders",
    cust_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> str:
    """DuckDB twin of :func:`rfm_segments` (plain NTILE windows — the
    oracle does not need the distributed construction)."""
    return f"""
    WITH pc AS (
      SELECT {cust_col} AS ck,
             MAX(CAST({ts_col} AS DATE)) AS last_d,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST({amount_col} AS DECIMAL(18,2))) AS mon
      FROM {table} GROUP BY {cust_col}
    ),
    hz AS (SELECT MAX(CAST({ts_col} AS DATE)) AS hz FROM {table}),
    rfm AS (
      SELECT ck, CAST(date_diff('day', last_d, hz) AS BIGINT) AS rec,
             freq, mon
      FROM pc, hz
    ),
    scored AS (
      SELECT ck, mon,
             CAST(NTILE(5) OVER (ORDER BY rec DESC, ck) AS INTEGER) AS r_score,
             CAST(NTILE(5) OVER (ORDER BY freq, ck) AS INTEGER) AS f_score,
             CAST(NTILE(5) OVER (ORDER BY mon, ck) AS INTEGER) AS m_score
      FROM rfm
    )
    SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment,
           r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(mon) AS DOUBLE) / COUNT(*) AS avg_monetary
    FROM scored
    GROUP BY r_score, f_score, m_score
    """


def cohort_ltv_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int = 6,
) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by FIRST-activity
    month, cumulative value per cohort at each month-since-signup —
    the unit-economics triangle next to cohort_retention_matrix's
    who-came-back (this one answers what-they-were-worth).

    Determinism: month indices are exact integer year*12+month
    arithmetic; per-(cohort, month) value sums are ROUNDed (default
    6dp — double addend order differs across engines), and the
    cumulative sum then runs over the month-ORDERED rounded values,
    so the running totals are bit-identical. Scale: two aggregations
    (user first-month, cohort-month rollup) + one window over the
    tiny cohort x month grid.

    Output: (cohort_month, months_since, n_users, month_value,
    cum_value) — n_users = cohort size, constant per cohort row.
    """
    mon = F.year(ts_col) * 12 + F.month(ts_col)
    first = df.groupBy(F.col(user_col).alias("u")).agg(
        F.min(mon).cast("bigint").alias("cm")
    )
    sized = first.groupBy("cm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    rolled = (
        df.select(
            F.col(user_col).alias("u"),
            mon.cast("bigint").alias("em"),
            F.col(value_col).alias("v"),
        )
        .join(first, "u")
        .groupBy("cm", (F.col("em") - F.col("cm")).alias("months_since"))
        .agg(F.round(F.sum("v"), round_to).alias("month_value"))
    )
    w = Window.partitionBy("cm").orderBy("months_since").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        rolled.join(F.broadcast(sized), "cm")
        .select(
            F.col("cm").alias("cohort_month"),
            "months_since",
            "n_users",
            "month_value",
            F.round(F.sum("month_value").over(w), round_to).alias("cum_value"),
        )
    )


def cohort_ltv_curve_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cohort_ltv_curve`."""
    return f"""
    WITH first AS (
      SELECT {user_col} AS u,
             CAST(MIN(year({ts_col}) * 12 + month({ts_col})) AS BIGINT) AS cm
      FROM {table} GROUP BY 1
    ),
    sized AS (
      SELECT cm, CAST(COUNT(*) AS BIGINT) AS n_users FROM first GROUP BY cm
    ),
    rolled AS (
      SELECT first.cm,
             CAST(year(e.{ts_col}) * 12 + month(e.{ts_col}) AS BIGINT)
               - first.cm AS months_since,
             ROUND(SUM(e.{value_col}), {round_to}) AS month_value
      FROM {table} e JOIN first ON first.u = e.{user_col}
      GROUP BY 1, 2
    )
    SELECT rolled.cm AS cohort_month, rolled.months_since, sized.n_users,
           rolled.month_value,
           ROUND(SUM(rolled.month_value) OVER (
                 PARTITION BY rolled.cm ORDER BY rolled.months_since
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 {round_to}) AS cum_value
    FROM rolled JOIN sized ON sized.cm = rolled.cm
    """


def monthly_growth_accounting(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Growth accounting (the Social Capital framework): per calendar
    month, decompose the active-user count into NEW (first month),
    RETAINED (also active the previous month), RESURRECTED (active
    before, not last month) — and count CHURNED (active last month,
    absent now) — the standard "is growth real or replacement"
    decomposition, extending daily_active_new_returning to full
    lifecycle states.

    Exact integer month indices (year*12+month) and counts; the
    identity active = new + retained + resurrected holds per row, and
    churned(m) = active(m-1) - retained(m). Scale: one user-month
    distinct reduction, one self-join on the adjacent month, one
    first-month join — all on the user-month grain.

    Output: (month, active, new_users, retained, resurrected,
    churned).
    """
    um = (
        df.select(
            F.col(user_col).alias("u"),
            (F.year(ts_col) * 12 + F.month(ts_col)).cast("bigint").alias("m"),
        )
        .distinct()
    )
    first = um.groupBy("u").agg(F.min("m").alias("fm"))
    prev = um.select("u", (F.col("m") + 1).alias("m"), F.lit(1).alias("__p"))
    flagged = (
        um.join(first, "u")
        .join(prev, ["u", "m"], "left")
        .select(
            "m",
            (F.col("fm") == F.col("m")).cast("int").alias("__new"),
            F.coalesce(F.col("__p"), F.lit(0)).alias("__prev"),
        )
    )
    per_month = flagged.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("active"),
        F.sum("__new").cast("bigint").alias("new_users"),
        F.sum(F.col("__prev")).cast("bigint").alias("retained"),
        F.sum(
            (1 - F.col("__new")) * (1 - F.col("__prev"))
        ).cast("bigint").alias("resurrected"),
    )
    lastm = per_month.select(
        (F.col("m") + 1).alias("m"), F.col("active").alias("__prev_active")
    )
    return (
        per_month.join(lastm, "m", "left")
        .select(
            F.col("m").alias("month"),
            "active",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce(
                F.col("__prev_active") - F.col("retained"), F.lit(0)
            ).cast("bigint").alias("churned"),
        )
    )


def monthly_growth_accounting_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`monthly_growth_accounting`."""
    return f"""
    WITH um AS (
      SELECT DISTINCT {user_col} AS u,
             CAST(year({ts_col}) * 12 + month({ts_col}) AS BIGINT) AS m
      FROM {table}
    ),
    first AS (SELECT u, MIN(m) AS fm FROM um GROUP BY u),
    flagged AS (
      SELECT um.m,
             CASE WHEN first.fm = um.m THEN 1 ELSE 0 END AS is_new,
             CASE WHEN prev.u IS NULL THEN 0 ELSE 1 END AS was_prev
      FROM um
      JOIN first ON first.u = um.u
      LEFT JOIN um prev ON prev.u = um.u AND prev.m = um.m - 1
    ),
    per_month AS (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS active,
             CAST(SUM(is_new) AS BIGINT) AS new_users,
             CAST(SUM(was_prev) AS BIGINT) AS retained,
             CAST(SUM((1 - is_new) * (1 - was_prev)) AS BIGINT)
               AS resurrected
      FROM flagged GROUP BY m
    )
    SELECT p.m AS month, p.active, p.new_users, p.retained, p.resurrected,
           CAST(COALESCE(q.active - p.retained, 0) AS BIGINT) AS churned
    FROM per_month p
    LEFT JOIN per_month q ON q.m = p.m - 1
    """


def tier_migration_matrix(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    value_col: str,
    k: int = 5,
) -> DataFrame:
    """Customer value-tier migration between the corpus's two time
    halves: quintile each unit's per-half spend (distributed
    two-phase NTILE — no single-task window), then count the
    (tier_pre, tier_post) transition matrix, with tier 0 = inactive
    in that half — the upgrade/downgrade/churn view a revenue team
    reads weekly.

    Determinism: halves split on the integer-micros midpoint; spend
    accumulates in DECIMAL(18,2); the NTILE total order breaks ties
    on (spend desc, unit), so every tier assignment is exact.
    Output: (tier_pre, tier_post, n_units).
    """
    from ..operators.ranking import with_ntile

    # cast covers TIMESTAMP_NTZ sources (identity under the UTC
    # session zone, matching DuckDB's epoch_us)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    span = df.agg(
        F.min(us).alias("__t0"),
        F.max(us).alias("__t1"),
    )
    tagged = df.crossJoin(F.broadcast(span)).select(
        F.col(unit_col).alias("u"),
        (us - F.col("__t0") >= F.expr("(__t1 - __t0) div 2"))
        .cast("int")
        .alias("post"),
        F.col(value_col).cast("decimal(18,2)").alias("v"),
    )
    halves = tagged.groupBy("u", "post").agg(
        F.sum("v").cast("decimal(18,2)").alias("spend")
    )
    pre = with_ntile(
        halves.where(F.col("post") == 0),
        [F.col("spend").desc(), F.col("u")],
        k,
        out_col="tier",
    ).select("u", F.col("tier").alias("tier_pre"))
    post = with_ntile(
        halves.where(F.col("post") == 1),
        [F.col("spend").desc(), F.col("u")],
        k,
        out_col="tier",
    ).select("u", F.col("tier").alias("tier_post"))
    units = halves.select("u").distinct()
    return (
        units.join(pre, "u", "left")
        .join(post, "u", "left")
        .na.fill({"tier_pre": 0, "tier_post": 0})
        .groupBy(
            F.col("tier_pre").cast("int").alias("tier_pre"),
            F.col("tier_post").cast("int").alias("tier_post"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_units"))
    )


def tier_migration_matrix_sql(
    table_sql: str,
    unit_col: str,
    ts_col: str,
    value_col: str,
    k: int = 5,
) -> str:
    """DuckDB twin of :func:`tier_migration_matrix`; ``table_sql``
    yields (unit, ts, value) rows."""
    return f"""
    WITH src AS ({table_sql}),
    span AS (
      SELECT epoch_us(MIN({ts_col})) AS t0, epoch_us(MAX({ts_col})) AS t1
      FROM src
    ),
    halves AS (
      SELECT {unit_col} AS u,
             CASE WHEN epoch_us({ts_col}) - span.t0
                       >= (span.t1 - span.t0) // 2
                  THEN 1 ELSE 0 END AS post,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS spend
      FROM src CROSS JOIN span
      GROUP BY 1, 2
    ),
    pre AS (
      SELECT u, CAST(ntile({k}) OVER (ORDER BY spend DESC, u) AS INTEGER)
               AS tier_pre
      FROM halves WHERE post = 0
    ),
    post_t AS (
      SELECT u, CAST(ntile({k}) OVER (ORDER BY spend DESC, u) AS INTEGER)
               AS tier_post
      FROM halves WHERE post = 1
    ),
    units AS (SELECT DISTINCT u FROM halves)
    SELECT CAST(COALESCE(pre.tier_pre, 0) AS INTEGER) AS tier_pre,
           CAST(COALESCE(post_t.tier_post, 0) AS INTEGER) AS tier_post,
           CAST(COUNT(*) AS BIGINT) AS n_units
    FROM units
    LEFT JOIN pre ON pre.u = units.u
    LEFT JOIN post_t ON post_t.u = units.u
    GROUP BY 1, 2
    """
