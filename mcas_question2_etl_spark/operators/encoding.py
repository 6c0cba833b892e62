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


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization across groups (the microarray/batch-
    effect-correction standard): each row's value is replaced by the
    POOLED distribution's value at the row's within-group quantile, so
    every group ends up with the same marginal distribution — the
    principled way to make per-source quality/length scores comparable
    before mixing corpus slices.

    All-integer index math: with within-group rank r of n_g and pooled
    size N, the target position is 1 + (r-1)*(N-1) DIV (n_g-1) —
    exact integer arithmetic, no float quantile that could round
    differently at .5 boundaries across engines. The pooled
    position -> value map is built with the distributed two-phase
    global rank (:mod:`.ranking`), not a single-task window; the
    within-group ranks shuffle once on the group key. Groups with a
    single row are excluded explicitly (their quantile is undefined).

    Output: (id, group, value, normalized).
    """
    from .ranking import with_global_row_number

    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("bigint").alias("__ng"))
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("__N"))
    wg = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = (
        df.select(group_col, value_col, id_col)
        .withColumn("__r", F.row_number().over(wg).cast("bigint"))
        .join(F.broadcast(sizes.filter(F.col("__ng") >= 2)), group_col)
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__idx",
            F.lit(1) + F.expr("(__r - 1) * (__N - 1) div (__ng - 1)"),
        )
    )
    pooled = with_global_row_number(
        df.select(F.col(value_col), F.col(id_col)),
        [F.col(value_col), F.col(id_col)],
        out_col="__pos",
    ).select(
        F.col("__pos").cast("bigint").alias("__idx"),
        F.col(value_col).alias("normalized"),
    )
    return ranked.join(pooled, "__idx").select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        "normalized",
    )


def quantile_normalize_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_col: str,
) -> str:
    """DuckDB twin of :func:`quantile_normalize` (plain windows — the
    oracle does not need the distributed construction)."""
    return f"""
    WITH sizes AS (
      SELECT {group_col} AS g, CAST(COUNT(*) AS BIGINT) AS ng
      FROM {table} GROUP BY {group_col}
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM {table}),
    ranked AS (
      SELECT {group_col} AS g, {value_col} AS v, {id_col} AS id,
             CAST(row_number() OVER (
               PARTITION BY {group_col} ORDER BY {value_col}, {id_col}
             ) AS BIGINT) AS r
      FROM {table}
    ),
    idxed AS (
      SELECT ranked.g, ranked.v, ranked.id,
             1 + (ranked.r - 1) * (t.N - 1) // (sizes.ng - 1) AS idx
      FROM ranked
      JOIN sizes ON sizes.g = ranked.g AND sizes.ng >= 2
      CROSS JOIN t
    ),
    pooled AS (
      SELECT CAST(row_number() OVER (ORDER BY {value_col}, {id_col}) AS BIGINT)
               AS idx,
             {value_col} AS normalized
      FROM {table}
    )
    SELECT i.id AS {id_col}, i.g AS {group_col}, i.v AS {value_col},
           p.normalized
    FROM idxed i JOIN pooled p ON p.idx = i.idx
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 164: weight-of-evidence / information-value feature audit
# ──────────────────────────────────────────────────────────────────────────


def woe_iv_audit(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    laplace: float = 0.5,
) -> DataFrame:
    """Weight of Evidence per category and the feature's Information
    Value — the credit-scoring-era feature audit that never left
    production (FICO/Basel lineage; Siddiqi 2006): for a binary
    target,

      WOE_c = ln( (event_c/E) / (nonevent_c/NE) ),
      IV    = Σ_c (event_c/E − nonevent_c/NE) · WOE_c

    with Laplace smoothing ``laplace`` added to both cell counts so
    one-sided categories stay finite. IV reads on the standard rule
    of thumb (<0.02 useless, 0.02–0.1 weak, 0.1–0.3 medium, >0.3
    strong) BEFORE anyone fits a model — the univariate complement
    of :func:`oof_target_encoding` (which builds the feature; this
    one decides whether it is worth building, without the leakage
    question since nothing is fed back into training rows).

    Exactness: cell counts are exact bigints; shares, ln and the IV
    terms are closed forms on identical inputs (k-row reduction; the
    per-category table is the feature's cardinality). Output per
    category: (category, n_event, n_nonevent, woe, iv_term) plus
    one TOTAL row (category NULL) carrying the summed IV, ordered
    with the total last.
    """
    lp = float(laplace)
    t = (
        F.col(target_col) if isinstance(target_col, str) else target_col
    ).cast("boolean")
    per = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("n_event"),
        F.sum(F.when(t, 0).otherwise(1))
        .cast("bigint")
        .alias("n_nonevent"),
    )
    tot = per.agg(
        F.sum("n_event").cast("bigint").alias("te"),
        F.sum("n_nonevent").cast("bigint").alias("tn"),
    )
    j = per.crossJoin(F.broadcast(tot))
    ge = (F.col("n_event").cast("double") + lp) / (
        F.col("te").cast("double") + lp
    )
    gn = (F.col("n_nonevent").cast("double") + lp) / (
        F.col("tn").cast("double") + lp
    )
    woe = F.log(ge / gn)
    ivt = (ge - gn) * woe
    rows = j.select(
        "category",
        "n_event",
        "n_nonevent",
        F.round(woe, 6).alias("woe"),
        F.round(ivt, 6).alias("iv_term"),
    )
    total = (
        j.agg(
            F.max("te").alias("n_event"),
            F.max("tn").alias("n_nonevent"),
            F.round(F.sum(ivt), 6).alias("iv_term"),
        )
        .select(
            F.lit(None).cast("string").alias("category"),
            F.col("n_event"),
            F.col("n_nonevent"),
            F.lit(None).cast("double").alias("woe"),
            "iv_term",
        )
    )
    return rows.unionByName(total).orderBy(
        F.col("category").asc_nulls_last()
    )


def woe_iv_audit_sql(
    table: str,
    cat_col: str,
    target_expr: str,
    laplace: float = 0.5,
) -> str:
    """DuckDB twin of :func:`woe_iv_audit` (same smoothing, same
    closed-form order, same NULL total row last)."""
    lp = float(laplace)
    return f"""
    WITH per AS (
      SELECT {cat_col} AS category,
             CAST(SUM(CASE WHEN {target_expr} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_event,
             CAST(SUM(CASE WHEN {target_expr} THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_nonevent
      FROM {table} GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_event) AS BIGINT) AS te,
             CAST(SUM(n_nonevent) AS BIGINT) AS tn
      FROM per
    ),
    scored AS (
      SELECT category, n_event, n_nonevent,
             LN(((CAST(n_event AS DOUBLE) + {lp!r})
                 / (CAST(te AS DOUBLE) + {lp!r}))
                / ((CAST(n_nonevent AS DOUBLE) + {lp!r})
                   / (CAST(tn AS DOUBLE) + {lp!r}))) AS woe,
             ((CAST(n_event AS DOUBLE) + {lp!r})
              / (CAST(te AS DOUBLE) + {lp!r})
              - (CAST(n_nonevent AS DOUBLE) + {lp!r})
                / (CAST(tn AS DOUBLE) + {lp!r}))
             * LN(((CAST(n_event AS DOUBLE) + {lp!r})
                   / (CAST(te AS DOUBLE) + {lp!r}))
                  / ((CAST(n_nonevent AS DOUBLE) + {lp!r})
                     / (CAST(tn AS DOUBLE) + {lp!r}))) AS iv_term,
             te, tn
      FROM per CROSS JOIN tot
    )
    SELECT category, n_event, n_nonevent,
           ROUND(woe, 6) AS woe, ROUND(iv_term, 6) AS iv_term
    FROM scored
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), MAX(te), MAX(tn),
           CAST(NULL AS DOUBLE), ROUND(SUM(iv_term), 6)
    FROM scored
    ORDER BY category ASC NULLS LAST
    """
