"""Bilateral price-index numbers: Laspeyres, Paasche, Fisher.

The economics of "did prices rise or did the mix shift" — the same
question a marketplace/revenue team asks between two periods. Base-
weighted Laspeyres overstates inflation (substitution bias), current-
weighted Paasche understates it, Fisher's ideal index is their
geometric mean (Diewert's superlative class). Computed here between
the corpus's two time halves over items present in BOTH.

Determinism: per-item quantities and spends are exact (bigint /
DECIMAL(18,2)); unit prices are single exact-input divisions; the
cross-item basket sums are doubles and therefore ROUNDed, then the
three indices are fixed IEEE expressions on the rounded basket
totals. One scan to the (item, half) grain; everything after is
item-grain joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def price_index_halves(
    df: DataFrame,
    item_col: str,
    price_col: str,
    qty_col: str,
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """(n_items, laspeyres, paasche, fisher) between the corpus's two
    ``ts_col`` halves; ``price_col`` is extended (line) value, unit
    price = value/quantity per half."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    span = df.agg(F.min(us).alias("__t0"), F.max(us).alias("__t1"))
    tagged = df.crossJoin(F.broadcast(span)).select(
        F.col(item_col).alias("i"),
        (us - F.col("__t0") >= F.expr("(__t1 - __t0) div 2"))
        .cast("int")
        .alias("post"),
        F.col(price_col).cast("decimal(18,2)").alias("v"),
        F.col(qty_col).cast("bigint").alias("q"),
    )
    halves = tagged.groupBy("i", "post").agg(
        F.sum("v").cast("decimal(38,2)").alias("spend"),
        F.sum("q").cast("bigint").alias("qty"),
    )
    p = F.col("spend").cast("double") / F.col("qty")
    h0 = halves.where(F.col("post") == 0).select(
        "i", p.alias("p0"), F.col("qty").alias("q0")
    )
    h1 = halves.where(F.col("post") == 1).select(
        "i", p.alias("p1"), F.col("qty").alias("q1")
    )
    j = h0.join(h1, "i")
    basket = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum(F.col("p1") * F.col("q0")), round_to).alias("__l_num"),
        F.round(F.sum(F.col("p0") * F.col("q0")), round_to).alias("__l_den"),
        F.round(F.sum(F.col("p1") * F.col("q1")), round_to).alias("__p_num"),
        F.round(F.sum(F.col("p0") * F.col("q1")), round_to).alias("__p_den"),
    )
    lasp = F.col("__l_num") / F.col("__l_den")
    paas = F.col("__p_num") / F.col("__p_den")
    return basket.select(
        "n_items",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


def price_index_halves_sql(
    table: str,
    item_col: str,
    price_col: str,
    qty_col: str,
    ts_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`price_index_halves`."""
    return f"""
    WITH span AS (
      SELECT epoch_us(MIN(CAST({ts_col} AS TIMESTAMP))) AS t0,
             epoch_us(MAX(CAST({ts_col} AS TIMESTAMP))) AS t1
      FROM {table}
    ),
    tagged AS (
      SELECT {item_col} AS i,
             CASE WHEN epoch_us(CAST({ts_col} AS TIMESTAMP)) - span.t0
                       >= (span.t1 - span.t0) // 2
                  THEN 1 ELSE 0 END AS post,
             CAST({price_col} AS DECIMAL(18,2)) AS v,
             CAST({qty_col} AS BIGINT) AS q
      FROM {table} CROSS JOIN span
    ),
    halves AS (
      SELECT i, post, CAST(SUM(v) AS DECIMAL(38,2)) AS spend,
             CAST(SUM(q) AS BIGINT) AS qty
      FROM tagged GROUP BY i, post
    ),
    h0 AS (SELECT i, CAST(spend AS DOUBLE) / qty AS p0, qty AS q0
           FROM halves WHERE post = 0),
    h1 AS (SELECT i, CAST(spend AS DOUBLE) / qty AS p1, qty AS q1
           FROM halves WHERE post = 1),
    basket AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             ROUND(SUM(p1 * q0), {round_to}) AS l_num,
             ROUND(SUM(p0 * q0), {round_to}) AS l_den,
             ROUND(SUM(p1 * q1), {round_to}) AS p_num,
             ROUND(SUM(p0 * q1), {round_to}) AS p_den
      FROM h0 JOIN h1 ON h1.i = h0.i
    )
    SELECT n_items,
           l_num / l_den AS laspeyres,
           p_num / p_den AS paasche,
           sqrt((l_num / l_den) * (p_num / p_den)) AS fisher
    FROM basket
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 139: newsvendor critical-fractile stock + EOQ
# ──────────────────────────────────────────────────────────────────────────


def newsvendor_stock(
    demand: DataFrame,
    key_col: str = "item",
    qty_col: str = "qty",
    underage: float = 3.0,
    overage: float = 1.0,
    holding: float = 0.25,
    order_cost: float = 50.0,
    top_k: int = 25,
    round_to: int = 6,
) -> DataFrame:
    """Per-item single-period newsvendor stocking level and the EOQ
    batch size — the two closed forms that run inventory planning:

      * critical fractile ``q* = cu/(cu+co)``; the optimal stock is
        the q*-QUANTILE of the per-period demand distribution, taken
        here as the exact conformal-style ORDER STATISTIC
        ``ceil(q* · (n+1))``-th smallest observed demand (clamped) —
        distribution-free, no normal fit;
      * ``EOQ = sqrt(2·D·K/h)`` with D the mean per-period demand, K
        the fixed order cost, h the holding cost.

    Demand observations are exact integers; the order-statistic
    selection is deterministic ((qty, period-rank) total order); EOQ
    is one sqrt over exact aggregates. One groupBy + one per-key rank
    window bounded by each key's observation count.

    Output: top_k items by total demand: (item, n_periods,
    total_demand, stock_level, eoq) ordered by (total_demand desc,
    item).
    """
    cf = float(underage) / (float(underage) + float(overage))
    d = demand.select(
        F.col(key_col).alias("k"),
        F.col(qty_col).cast("bigint").alias("q"),
    )
    stats = d.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("tot"),
    )
    w = Window.partitionBy("k").orderBy(F.col("q").asc())
    ranked = d.withColumn("r", F.row_number().over(w).cast("bigint"))
    pick = (
        ranked.join(stats, "k")
        .filter(
            F.col("r")
            == F.least(
                F.ceil(F.lit(cf) * (F.col("n") + 1).cast("double")).cast(
                    "bigint"
                ),
                F.col("n"),
            )
        )
        .select("k", "n", "tot", F.col("q").alias("stock_level"))
    )
    dbar = F.col("tot").cast("double") / F.col("n").cast("double")
    eoq = F.sqrt(
        F.lit(2.0) * dbar * F.lit(float(order_cost)) / F.lit(float(holding))
    )
    return (
        pick.select(
            F.col("k").alias(key_col),
            F.col("n").alias("n_periods"),
            F.col("tot").alias("total_demand"),
            "stock_level",
            F.round(eoq, round_to).alias("eoq"),
        )
        .orderBy(F.col("total_demand").desc(), F.col(key_col).asc())
        .limit(top_k)
    )


def newsvendor_stock_sql(
    demand_sql: str,
    key_col: str = "item",
    qty_col: str = "qty",
    underage: float = 3.0,
    overage: float = 1.0,
    holding: float = 0.25,
    order_cost: float = 50.0,
    top_k: int = 25,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`newsvendor_stock`."""
    cf = float(underage) / (float(underage) + float(overage))
    return f"""
    WITH src AS ({demand_sql}),
    d AS (SELECT {key_col} AS k, CAST({qty_col} AS BIGINT) AS q FROM src),
    stats AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS tot
      FROM d GROUP BY k
    ),
    ranked AS (
      SELECT k, q,
             CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY q ASC)
                  AS BIGINT) AS r
      FROM d
    ),
    pick AS (
      SELECT r.k, s.n, s.tot, r.q AS stock_level
      FROM ranked r JOIN stats s ON s.k = r.k
      WHERE r.r = LEAST(CAST(ceil({cf} * (s.n + 1)) AS BIGINT), s.n)
    )
    SELECT k AS {key_col},
           n AS n_periods,
           tot AS total_demand,
           stock_level,
           ROUND(sqrt(2.0 * (CAST(tot AS DOUBLE) / n) * {float(order_cost)}
                      / {float(holding)}), {round_to}) AS eoq
    FROM pick
    ORDER BY total_demand DESC, {key_col} ASC
    LIMIT {top_k}
    """
