"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw-corpus document by how target-like its hashed n-gram
bag is: ``logw(doc) = sum_tokens log p_target(bucket) - log p_raw(bucket)``
where both distributions live on a fixed B-bucket feature-hash space
with add-alpha smoothing. Docs are then resampled proportional to the
weights; here we compute the (deterministic) weights themselves, which
is the distributed part — the resample is one weighted_sample_topk away.

Scale shape: one explode over tokens, two groupBys whose RESULT is the
fixed B-row bucket table (map-side combine does almost all the work),
then a broadcast join of that tiny log-ratio table back onto the token
stream and a per-doc aggregation. The corpus shuffles only (doc_id,
bucket) pairs; the distributions never exceed B rows regardless of
corpus size, which is the entire point of feature hashing at 100 TB.

Hashing is the repo's portable md5 idiom (first 15 hex chars -> bigint)
so a DuckDB oracle reproduces bucket assignment bit-for-bit.

Reference scope: the reference repo has no corpus-curation layer; this
extends the engine's LLM-pipeline surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _bucket(col: str, buckets: int) -> Column:
    return F.expr(
        f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint) % {buckets}"
    )


def _bucket_sql(col: str, buckets: int) -> str:
    return (
        f"CAST(('0x' || substring(md5({col}), 1, 15)) AS BIGINT) % {buckets}"
    )


def dsir_log_weights(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``target_pred`` marks the rows defining the target distribution
    (e.g. a trusted high-quality slice); the raw distribution is the
    whole input. Returns ``(id_col, n_tokens, logw)``.
    """
    ex = df.select(
        F.col(id_col),
        target_pred.alias("__is_t"),
        F.explode(tokens(text_col)).alias("__t"),
    ).withColumn("__b", _bucket("__t", buckets))

    raw = ex.groupBy("__b").agg(F.count(F.lit(1)).cast("double").alias("__cr"))
    tgt = (
        ex.filter(F.col("__is_t"))
        .groupBy("__b")
        .agg(F.count(F.lit(1)).cast("double").alias("__ct"))
    )
    totals = ex.agg(
        F.count(F.lit(1)).cast("double").alias("__nr"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).cast("double").alias("__nt"),
    )
    # B-row log-ratio table: smoothed target logp minus smoothed raw logp
    ratio = (
        raw.join(tgt, "__b", "left")
        .na.fill({"__ct": 0.0})
        .crossJoin(F.broadcast(totals))
        .select(
            "__b",
            (
                F.log((F.col("__ct") + alpha) / (F.col("__nt") + alpha * buckets))
                - F.log((F.col("__cr") + alpha) / (F.col("__nr") + alpha * buckets))
            ).alias("__lr"),
        )
    )
    return (
        ex.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("__lr").alias("logw"),
        )
    )


def dsir_log_weights_sql(
    target_pred_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    buckets: int = 64,
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of :func:`dsir_log_weights`."""
    b = _bucket_sql("t", buckets)
    return f"""
    WITH ex0 AS (
      SELECT {id_col}, ({target_pred_sql}) AS is_t,
             unnest(string_split({text_col}, ' ')) AS t
      FROM {table}
    ),
    e AS (SELECT {id_col}, is_t, {b} AS b FROM ex0),
    raw AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS cr FROM e GROUP BY b),
    tgt AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS ct FROM e WHERE is_t GROUP BY b),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nr,
                   CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS DOUBLE) AS nt
            FROM e),
    ratio AS (
      SELECT raw.b,
             ln((COALESCE(tgt.ct, 0) + {alpha}) / (tot.nt + {alpha} * {buckets}))
             - ln((raw.cr + {alpha}) / (tot.nr + {alpha} * {buckets})) AS lr
      FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
    )
    SELECT e.{id_col},
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           SUM(ratio.lr) AS logw
    FROM e JOIN ratio ON e.b = ratio.b
    GROUP BY e.{id_col}
    """
