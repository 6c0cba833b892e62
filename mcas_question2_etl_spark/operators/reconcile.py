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


# ──────────────────────────────────────────────────────────────────────────
# wave 117: method agreement — Lin's CCC + Bland-Altman limits
# ──────────────────────────────────────────────────────────────────────────


def concordance_ccc(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Lin's concordance correlation coefficient between two paired
    measurements of the same quantity:

      CCC = 2·cov(x,y) / (σ²_x + σ²_y + (μ_x − μ_y)²)

    — the agreement statistic Pearson is NOT: r rewards any linear
    relation (y = 2x + 5 scores r = 1) while CCC penalizes both the
    scale and location bias, so it only reaches 1 when the two
    pipelines actually AGREE. The statistical single-number companion
    to row-level reconciliation (order_total_reconciliation) and
    errors-in-both-variables fitting (deming_regression). Also
    reports Pearson r and the bias-correction factor C_b = CCC/r that
    separates precision from accuracy. One exact-moment aggregate.
    Output (one row): n, pearson_r, c_b, ccc."""
    pts = df.select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    g = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    mx = F.col("sx") / nn
    my = F.col("sy") / nn
    vx = F.col("sxx") / nn - mx * mx
    vy = F.col("syy") / nn - my * my
    cov = F.col("sxy") / nn - mx * my
    r = cov / F.sqrt(vx * vy)
    ccc = F.lit(2.0) * cov / (vx + vy + (mx - my) * (mx - my))
    return g.select(
        "n",
        F.round(r, round_to).alias("pearson_r"),
        F.round(ccc / r, round_to).alias("c_b"),
        F.round(ccc, round_to).alias("ccc"),
    )


def concordance_ccc_sql(
    source_sql: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`concordance_ccc`."""
    return f"""
    WITH src AS ({source_sql}),
    pts AS (
      SELECT CAST({x_col} AS DOUBLE) AS x, CAST({y_col} AS DOUBLE) AS y
      FROM src WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pts
    )
    SELECT n,
           ROUND((sxy / CAST(n AS DOUBLE)
                  - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                 / SQRT((sxx / CAST(n AS DOUBLE)
                         - (sx / CAST(n AS DOUBLE))
                           * (sx / CAST(n AS DOUBLE)))
                        * (syy / CAST(n AS DOUBLE)
                           - (sy / CAST(n AS DOUBLE))
                             * (sy / CAST(n AS DOUBLE)))),
                 {round_to}) AS pearson_r,
           ROUND((2.0 * (sxy / CAST(n AS DOUBLE)
                         - (sx / CAST(n AS DOUBLE))
                           * (sy / CAST(n AS DOUBLE)))
                  / ((sxx / CAST(n AS DOUBLE)
                      - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
                     + (syy / CAST(n AS DOUBLE)
                        - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                     + ((sx / CAST(n AS DOUBLE)) - (sy / CAST(n AS DOUBLE)))
                       * ((sx / CAST(n AS DOUBLE))
                          - (sy / CAST(n AS DOUBLE)))))
                 / ((sxy / CAST(n AS DOUBLE)
                     - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                    / SQRT((sxx / CAST(n AS DOUBLE)
                            - (sx / CAST(n AS DOUBLE))
                              * (sx / CAST(n AS DOUBLE)))
                           * (syy / CAST(n AS DOUBLE)
                              - (sy / CAST(n AS DOUBLE))
                                * (sy / CAST(n AS DOUBLE))))),
                 {round_to}) AS c_b,
           ROUND(2.0 * (sxy / CAST(n AS DOUBLE)
                        - (sx / CAST(n AS DOUBLE))
                          * (sy / CAST(n AS DOUBLE)))
                 / ((sxx / CAST(n AS DOUBLE)
                     - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
                    + (syy / CAST(n AS DOUBLE)
                       - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)))
                    + ((sx / CAST(n AS DOUBLE)) - (sy / CAST(n AS DOUBLE)))
                      * ((sx / CAST(n AS DOUBLE))
                         - (sy / CAST(n AS DOUBLE)))),
                 {round_to}) AS ccc
    FROM g
    """


def bland_altman(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Bland-Altman limits of agreement for two paired measurement
    pipelines: mean difference (the systematic bias), d̄ ± 1.96·SD_d
    (the 95% limits within which the pipelines disagree for a single
    observation), and the observed fraction outside the limits
    (≈ 5% when differences are normal — a cheap normality cross-
    check). The per-observation companion to concordance_ccc's single
    number: CCC says HOW MUCH agreement, the limits say WHAT RANGE of
    disagreement to expect per row. Two exact-moment passes (the
    second counts exceedances against broadcast limits), z as a
    literal. Output (one row): n, bias, loa_lo, loa_hi,
    frac_outside."""
    z = 1.959963984540054
    pts = df.select(
        (
            F.col(x_col).cast("double") - F.col(y_col).cast("double")
        ).alias("__d")
    ).filter(F.col("__d").isNotNull())
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__d").alias("sd"),
        F.sum(F.col("__d") * F.col("__d")).alias("sdd"),
    )
    nn = F.col("n").cast("double")
    bias = F.col("sd") / nn
    sd = F.sqrt(
        (F.col("sdd") - F.col("sd") * F.col("sd") / nn) / (nn - 1.0)
    )
    lims = m.select(
        "n",
        bias.alias("__bias"),
        (bias - F.lit(z) * sd).alias("__lo"),
        (bias + F.lit(z) * sd).alias("__hi"),
    )
    counted = pts.crossJoin(F.broadcast(lims)).agg(
        F.max("n").alias("n"),
        F.max("__bias").alias("__bias"),
        F.max("__lo").alias("__lo"),
        F.max("__hi").alias("__hi"),
        F.sum(
            F.when(
                (F.col("__d") < F.col("__lo"))
                | (F.col("__d") > F.col("__hi")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("__out"),
    )
    return counted.select(
        "n",
        F.round(F.col("__bias"), round_to).alias("bias"),
        F.round(F.col("__lo"), round_to).alias("loa_lo"),
        F.round(F.col("__hi"), round_to).alias("loa_hi"),
        F.round(
            F.col("__out").cast("double") / F.col("n").cast("double"),
            round_to,
        ).alias("frac_outside"),
    )


def bland_altman_sql(
    source_sql: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`bland_altman`."""
    z = 1.959963984540054
    return f"""
    WITH src AS ({source_sql}),
    pts AS (
      SELECT CAST({x_col} AS DOUBLE) - CAST({y_col} AS DOUBLE) AS d
      FROM src
      WHERE CAST({x_col} AS DOUBLE) - CAST({y_col} AS DOUBLE) IS NOT NULL
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(d) AS sd,
             SUM(d * d) AS sdd
      FROM pts
    ),
    lims AS (
      SELECT n, sd / CAST(n AS DOUBLE) AS bias,
             sd / CAST(n AS DOUBLE)
               - {z!r} * SQRT((sdd - sd * sd / CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0)) AS lo,
             sd / CAST(n AS DOUBLE)
               + {z!r} * SQRT((sdd - sd * sd / CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0)) AS hi
      FROM m
    )
    SELECT l.n,
           ROUND(l.bias, {round_to}) AS bias,
           ROUND(l.lo, {round_to}) AS loa_lo,
           ROUND(l.hi, {round_to}) AS loa_hi,
           ROUND(CAST(SUM(CASE WHEN p.d < l.lo OR p.d > l.hi
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(l.n AS DOUBLE), {round_to}) AS frac_outside
    FROM pts p CROSS JOIN lims l
    GROUP BY l.n, l.bias, l.lo, l.hi
    """
