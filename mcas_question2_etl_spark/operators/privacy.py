"""K-anonymity / l-diversity release audit.

Before any tabular release or cross-team share, the standard privacy
question (Sweeney 2002; Machanavajjhala et al. 2007): how large are
the equivalence classes induced by the quasi-identifier columns
(k-anonymity), and how many distinct sensitive values does each class
hold (l-diversity)? A class of size 1 re-identifies a row outright; a
large class whose sensitive column is constant still leaks it.

Output is the class-size histogram enriched with the l-diversity
floor — (class_size k, n_classes, n_rows, min_l, frac_rows) — the
table a release gate thresholds on ("suppress classes with k < 5 or
l < 2").

Exactness: everything is COUNT/COUNT DISTINCT over exact keys; the
only division (frac_rows) is a single exact-bigint ratio.

Scale shape: one groupBy on the QI tuple (the corpus shuffle), then
histogram rollups over the CLASS table; the row total is a broadcast
1-row scalar.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> DataFrame:
    """(class_size, n_classes, n_rows, min_l, frac_rows) over the
    equivalence classes of ``quasi_cols``."""
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.countDistinct(sensitive_col).cast("bigint").alias("__l"),
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("__N"))
    return (
        classes.groupBy(F.col("__k").alias("class_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("__k").cast("bigint").alias("n_rows"),
            F.min("__l").alias("min_l"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "frac_rows", F.col("n_rows").cast("double") / F.col("__N")
        )
        .drop("__N")
    )


def k_anonymity_audit_sql(
    table: str,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> str:
    """DuckDB twin of :func:`k_anonymity_audit`."""
    qi = ", ".join(quasi_cols)
    return f"""
    WITH classes AS (
      SELECT {qi}, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT {sensitive_col}) AS BIGINT) AS l
      FROM {table} GROUP BY {qi}
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS N FROM {table})
    SELECT k AS class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           MIN(l) AS min_l,
           CAST(SUM(k) AS DOUBLE) / MAX(t.N) AS frac_rows
    FROM classes CROSS JOIN t
    GROUP BY k
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 160: k-ary randomized response (local differential privacy)
# ──────────────────────────────────────────────────────────────────────────

#: md5-uniform denominator — 15 hex chars = 60 bits (the repo's
#: portable-uniform convention, bootstrap/survey/sampling)
_RR_DENOM = float(1 << 60)


def randomized_response_frequency(
    df: DataFrame,
    key_col: str,
    cat_col: str,
    p_truth: float = 0.75,
) -> DataFrame:
    """k-ary randomized response (Warner 1965 generalized): each row
    reports its TRUE category with probability p and a uniform draw
    over all k categories otherwise, then the aggregator DEBIASES the
    observed shares —

      q_c = p·π_c + (1−p)/k   ⇒   π̂_c = (q_c − (1−p)/k) / p

    — the local-DP frequency oracle (ε = ln(1 + kp/(1−p))): no row
    ever leaves the client un-noised, yet population shares come back
    unbiased. This operator is the RELEASE-side audit: it runs the
    mechanism and the estimator side by side with the true shares, so
    a release gate can see the privacy/utility trade at this (p, k)
    before shipping the channel.

    Determinism: the "randomness" is the repo's portable md5 uniform
    (two independent draws per row from disjoint salts), so both
    engines privatize IDENTICALLY and the oracle checks exact counts;
    a production rollout swaps the hash for client randomness and
    keeps every line of the estimator.

    Scale shape: the category dictionary (k rows) builds once from a
    distinct scan, broadcasts for the uniform-replacement pick, and
    everything else is one groupBy over k categories.

    Output per category: (category, n_true, n_reported, share_true,
    share_reported, share_debiased, abs_err), ordered by category.
    """
    p = float(p_truth)
    cats = (
        df.select(F.col(cat_col).alias("c"))
        .distinct()
        .groupBy()
        .agg(F.sort_array(F.collect_list("c")).alias("cs"))
    )
    u1 = (
        F.expr(
            f"cast(conv(substring(md5(concat(cast({key_col} as string), "
            f"':rr1')), 1, 15), 16, 10) as bigint)"
        )
        / F.lit(_RR_DENOM)
    )
    u2 = (
        F.expr(
            f"cast(conv(substring(md5(concat(cast({key_col} as string), "
            f"':rr2')), 1, 15), 16, 10) as bigint)"
        )
        / F.lit(_RR_DENOM)
    )
    staged = df.select(
        F.col(cat_col).alias("true_c"),
        u1.alias("__u1"),
        u2.alias("__u2"),
    ).crossJoin(F.broadcast(cats))
    k = F.size("cs")
    reported = F.when(F.col("__u1") < p, F.col("true_c")).otherwise(
        F.element_at(
            "cs",
            (F.floor(F.col("__u2") * k.cast("double")) + 1).cast("int"),
        )
    )
    rows = staged.select(
        "true_c", reported.alias("rep_c"), k.alias("k")
    )
    n_tot = rows.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    per_true = rows.groupBy(F.col("true_c").alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.max("k").alias("k"),
    )
    per_rep = rows.groupBy(F.col("rep_c").alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reported")
    )
    j = (
        per_true.join(per_rep, "category", "left")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "category",
            "n_true",
            F.coalesce("n_reported", F.lit(0)).alias("n_reported"),
            "k",
            "n",
        )
    )
    share_true = F.col("n_true").cast("double") / F.col("n").cast("double")
    share_rep = (
        F.col("n_reported").cast("double") / F.col("n").cast("double")
    )
    debiased = (
        share_rep - (1.0 - p) / F.col("k").cast("double")
    ) / F.lit(p)
    return j.select(
        "category",
        "n_true",
        "n_reported",
        F.round(share_true, 6).alias("share_true"),
        F.round(share_rep, 6).alias("share_reported"),
        F.round(debiased, 6).alias("share_debiased"),
        F.round(F.abs(debiased - share_true), 6).alias("abs_err"),
    ).orderBy("category")


def randomized_response_frequency_sql(
    table: str,
    key_col: str,
    cat_col: str,
    p_truth: float = 0.75,
) -> str:
    """DuckDB twin of :func:`randomized_response_frequency` (same md5
    draws, same debiasing shapes)."""
    p = float(p_truth)
    u1 = (
        f"CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR) ||"
        f" ':rr1'), 1, 15)) AS BIGINT) / {_RR_DENOM!r}"
    )
    u2 = (
        f"CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR) ||"
        f" ':rr2'), 1, 15)) AS BIGINT) / {_RR_DENOM!r}"
    )
    return f"""
    WITH cats AS (
      SELECT LIST(c ORDER BY c) AS cs,
             CAST(LEN(LIST(c ORDER BY c)) AS INTEGER) AS kk
      FROM (SELECT DISTINCT {cat_col} AS c FROM {table})
    ),
    staged AS (
      SELECT {cat_col} AS true_c,
             CASE WHEN {u1} < {p!r} THEN {cat_col}
                  ELSE cs[CAST(FLOOR({u2} * CAST(kk AS DOUBLE))
                               AS INTEGER) + 1]
             END AS rep_c,
             kk
      FROM {table} CROSS JOIN cats
    ),
    n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM staged),
    per_true AS (
      SELECT true_c AS category,
             CAST(COUNT(*) AS BIGINT) AS n_true,
             MAX(kk) AS kk
      FROM staged GROUP BY 1
    ),
    per_rep AS (
      SELECT rep_c AS category,
             CAST(COUNT(*) AS BIGINT) AS n_reported
      FROM staged GROUP BY 1
    )
    SELECT t.category,
           t.n_true,
           COALESCE(r.n_reported, 0) AS n_reported,
           ROUND(CAST(t.n_true AS DOUBLE) / CAST(n.n AS DOUBLE), 6)
             AS share_true,
           ROUND(CAST(COALESCE(r.n_reported, 0) AS DOUBLE)
                 / CAST(n.n AS DOUBLE), 6) AS share_reported,
           ROUND((CAST(COALESCE(r.n_reported, 0) AS DOUBLE)
                  / CAST(n.n AS DOUBLE)
                  - (1.0 - {p!r}) / CAST(t.kk AS DOUBLE)) / {p!r}, 6)
             AS share_debiased,
           ROUND(ABS((CAST(COALESCE(r.n_reported, 0) AS DOUBLE)
                      / CAST(n.n AS DOUBLE)
                      - (1.0 - {p!r}) / CAST(t.kk AS DOUBLE)) / {p!r}
                     - CAST(t.n_true AS DOUBLE) / CAST(n.n AS DOUBLE)),
                 6) AS abs_err
    FROM per_true t
    LEFT JOIN per_rep r USING (category)
    CROSS JOIN n_tot n
    ORDER BY t.category
    """
