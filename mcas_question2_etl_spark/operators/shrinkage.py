"""Empirical-Bayes proportion shrinkage (beta-binomial, method of
moments) — the "small-sample rates lie" fix every per-entity rate
report needs: a part with 1 return out of 2 lines is not a 50%%-return
part; shrinking toward the global rate with a strength learned FROM
the rate dispersion itself (Efron & Morris's baseball estimator,
popularized for proportions by Robinson) turns raw rates into usable
rankings.

    m       = global rate (exact bigint ratio)
    s2      = between-entity variance of raw rates (entities with
              n >= min_n), ROUNDed — the one cross-engine-order-
              sensitive sum
    K       = m(1-m)/s2 - 1   (prior strength alpha+beta; guarded)
    shrunk  = (x + m*K) / (n + K)

Scale shape: one aggregation to the entity grain, one 3-value global
row broadcast back; the corpus is scanned once. Reference parity:
beyond-reference (SURVEY §2.13) — the reference reports raw MCAS
rates; shrinkage is the canonical next step for its small schools.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eb_shrunk_rates(
    df: DataFrame,
    entity_col: str,
    success: Column,
    min_n: int = 2,
    fallback_strength: float = 50.0,
    round_to: int = 9,
) -> DataFrame:
    """Per-entity EB-shrunk success rates; ``success`` is a boolean
    column. Entities with n < ``min_n`` still get shrunk output but
    don't inform the prior-variance estimate. If the observed
    between-entity variance is <= 0 or implies non-positive strength
    (under-dispersion), ``fallback_strength`` is used.

    Output: (entity, n, successes, raw_rate, prior_rate,
    prior_strength, shrunk_rate).
    """
    ent = df.groupBy(F.col(entity_col).alias("e")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(success.cast("bigint")).cast("bigint").alias("x"),
    )
    rate = F.col("x").cast("double") / F.col("n")
    rated = ent.select("e", "n", "x", rate.alias("p"))
    glob = rated.agg(
        F.sum("x").cast("bigint").alias("__sx"),
        F.sum("n").cast("bigint").alias("__sn"),
        F.count(F.when(F.col("n") >= min_n, 1)).cast("bigint").alias("__k"),
        F.round(
            F.sum(F.when(F.col("n") >= min_n, F.col("p") * F.col("p"))),
            round_to,
        ).alias("__spp"),
        F.round(
            F.sum(F.when(F.col("n") >= min_n, F.col("p"))), round_to
        ).alias("__sp"),
    )
    m = F.col("__sx").cast("double") / F.col("__sn")
    s2 = (
        F.col("__spp") / F.col("__k")
        - (F.col("__sp") / F.col("__k")) * (F.col("__sp") / F.col("__k"))
    )
    raw_k = m * (1 - m) / s2 - 1
    strength = F.when(
        (s2 > 0) & (raw_k > 0), raw_k
    ).otherwise(F.lit(fallback_strength))
    prior = glob.select(
        m.alias("prior_rate"), strength.alias("prior_strength")
    )
    return rated.crossJoin(F.broadcast(prior)).select(
        F.col("e").alias(entity_col),
        "n",
        F.col("x").alias("successes"),
        F.col("p").alias("raw_rate"),
        "prior_rate",
        "prior_strength",
        (
            (
                F.col("x") + F.col("prior_rate") * F.col("prior_strength")
            )
            / (F.col("n") + F.col("prior_strength"))
        ).alias("shrunk_rate"),
    )


def eb_shrunk_rates_sql(
    table: str,
    entity_col: str,
    success_sql: str,
    min_n: int = 2,
    fallback_strength: float = 50.0,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`eb_shrunk_rates`; ``success_sql`` is a
    boolean expression over ``table``'s columns."""
    return f"""
    WITH ent AS (
      SELECT {entity_col} AS e, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {success_sql} THEN 1 ELSE 0 END) AS BIGINT)
               AS x
      FROM {table} GROUP BY 1
    ),
    rated AS (
      SELECT e, n, x, CAST(x AS DOUBLE) / n AS p FROM ent
    ),
    gstats AS (
      SELECT CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(n) AS BIGINT) AS sn,
             CAST(COUNT(CASE WHEN n >= {min_n} THEN 1 END) AS BIGINT) AS k,
             ROUND(SUM(CASE WHEN n >= {min_n} THEN p * p END), {round_to})
               AS spp,
             ROUND(SUM(CASE WHEN n >= {min_n} THEN p END), {round_to}) AS sp
      FROM rated
    ),
    prior AS (
      SELECT CAST(sx AS DOUBLE) / sn AS prior_rate,
             CASE WHEN (spp / k - (sp / k) * (sp / k)) > 0
                   AND ((CAST(sx AS DOUBLE) / sn)
                        * (1 - CAST(sx AS DOUBLE) / sn)
                        / (spp / k - (sp / k) * (sp / k)) - 1) > 0
                  THEN (CAST(sx AS DOUBLE) / sn)
                       * (1 - CAST(sx AS DOUBLE) / sn)
                       / (spp / k - (sp / k) * (sp / k)) - 1
                  ELSE {fallback_strength} END AS prior_strength
      FROM gstats
    )
    SELECT rated.e AS {entity_col}, rated.n, rated.x AS successes,
           rated.p AS raw_rate, prior.prior_rate, prior.prior_strength,
           (rated.x + prior.prior_rate * prior.prior_strength)
             / (rated.n + prior.prior_strength) AS shrunk_rate
    FROM rated CROSS JOIN prior
    """
