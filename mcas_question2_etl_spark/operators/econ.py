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

from pyspark.sql import DataFrame
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
