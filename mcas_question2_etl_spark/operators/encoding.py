"""Leakage-free categorical feature encoding for ML pipelines.

Out-of-fold (OOF) target encoding replaces a categorical level with the
mean of the target computed on OTHER folds only — the standard defense
against target leakage when mean-encoding before cross-validated
training. The arithmetic is the complement trick: with per-(level,fold)
partial sums and per-level totals,

    oof_mean(level, fold) = (sum_level - sum_{level,fold})
                          / (cnt_level - cnt_{level,fold})

so the whole encoding is ONE groupBy over (level, fold) — cardinality
``|levels| * n_folds``, tiny — plus a window-sum over that aggregate.
The raw table shuffles fixed-width keys once; nothing iterates, and
assigning the encodings back to rows is a broadcast join.

Fold membership uses the repo's deterministic md5 bucketing
(operators/sampling.py), never RNG: the same row lands in the same
fold on any engine, keeping the encoding oracle-checkable and
rerun-stable (the property sampling.py documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket


def oof_target_encoding(
    df: DataFrame,
    level_col: str,
    target_col: str,
    key_col: str,
    n_folds: int = 5,
    smoothing: float = 0.0,
    prior: float = 0.0,
) -> DataFrame:
    """Per-(level, fold) out-of-fold mean of ``target_col``.

    Optional additive smoothing pulls rare levels toward ``prior``:
    ``(sum_oof + smoothing * prior) / (cnt_oof + smoothing)``.
    Returns ``(level_col, fold, n_fold, oof_mean)``.
    """
    folds = df.select(
        F.col(level_col),
        F.col(target_col).cast("double").alias("__y"),
        hash_bucket(key_col, n_folds).cast("int").alias("fold"),
    )
    per = folds.groupBy(level_col, "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_fold"),
        F.sum("__y").alias("__s"),
    )
    w = Window.partitionBy(level_col)
    return per.select(
        F.col(level_col),
        "fold",
        "n_fold",
        F.round(
            (F.sum("__s").over(w) - F.col("__s") + smoothing * prior)
            / (F.sum("n_fold").over(w) - F.col("n_fold") + smoothing),
            6,
        ).alias("oof_mean"),
    )


def oof_target_encoding_sql(
    table: str,
    level_col: str,
    target_col: str,
    key_col: str,
    n_folds: int = 5,
    smoothing: float = 0.0,
    prior: float = 0.0,
) -> str:
    """DuckDB twin of :func:`oof_target_encoding`."""
    from .sampling import hash_bucket_sql

    fold = hash_bucket_sql(key_col, n_folds)
    return f"""
    WITH f AS (
      SELECT {level_col},
             CAST({target_col} AS DOUBLE) AS y,
             CAST({fold} AS INTEGER) AS fold
      FROM {table}
    ),
    per AS (
      SELECT {level_col}, fold,
             CAST(COUNT(*) AS BIGINT) AS n_fold,
             SUM(y) AS s
      FROM f GROUP BY {level_col}, fold
    )
    SELECT {level_col}, fold, n_fold,
           round((SUM(s) OVER (PARTITION BY {level_col}) - s
                  + {smoothing} * {prior})
                 / (SUM(n_fold) OVER (PARTITION BY {level_col}) - n_fold
                    + {smoothing}), 6) AS oof_mean
    FROM per
    """
