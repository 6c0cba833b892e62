"""Model/filter evaluation statistics, computed distributed.

A corpus pipeline that *scores* documents (quality classifiers,
language-ID confidence, perplexity filters) needs to *evaluate* those
scorers at corpus scale: AUC of a score against a label, and
significance tests between cohorts. The reference's analytics layer
stops at summary stats (school_outcomes_etl.py aggregate step); these
extend that layer with the two workhorse evaluation statistics, both
expressed so the heavy lifting is a grouped aggregate — never a global
per-row sort and never a driver-side collect.

Scale design:

* ``auc_rank_sum`` — Mann–Whitney AUC with tie correction. The naive
  formulation ranks every ROW globally (one total-order sort of the
  table). Instead we group by DISTINCT SCORE first (one shuffle whose
  cardinality is #distinct scores, not #rows), then compute each tied
  group's average rank from a running sum over the score-ordered
  groups. The only window runs over distinct scores — at 100 TB with a
  bounded score domain (every practical quality score) the window input
  is tiny.
* ``welch_ttest`` — one aggregate pass (conditional moments), zero
  joins, closed-form t statistic and Welch–Satterthwaite dof.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def auc_rank_sum(
    df: DataFrame, score: Column, label: Column, round_to: int = 6
) -> DataFrame:
    """AUC of ``score`` predicting boolean ``label``, ties averaged.

    Mann–Whitney: AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)
    where R_pos is the rank-sum of positives under average-tie ranking.
    For a tied group at score s with ``n_s`` rows, of which ``pos_s``
    positive, every row's average rank is ``below_s + (n_s + 1)/2``
    (``below_s`` = rows with strictly smaller score), contributing
    ``pos_s * that`` to R_pos. Output: one row
    (n_pos, n_neg, auc).
    """
    per_score = (
        df.select(score.alias("__s"), label.cast("int").alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("n_s"),
            F.sum("__y").alias("pos_s"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_score.withColumn(
        "below_s", F.coalesce(F.sum("n_s").over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        (F.sum("n_s") - F.sum("pos_s")).cast("long").alias("n_neg"),
        F.sum(
            F.col("pos_s") * (F.col("below_s") + (F.col("n_s") + 1) / 2.0)
        ).alias("r_pos"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0)
            / (F.col("n_pos") * F.col("n_neg")),
            round_to,
        ).alias("auc"),
    )


def auc_rank_sum_sql(
    table: str, score: str, label: str, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`auc_rank_sum`."""
    return f"""
    WITH per_score AS (
      SELECT {score} AS s, COUNT(*) AS n_s,
             SUM(CASE WHEN {label} THEN 1 ELSE 0 END) AS pos_s
      FROM {table} GROUP BY 1
    ), ranked AS (
      SELECT *, COALESCE(SUM(n_s) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS below_s
      FROM per_score
    ), agg AS (
      SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
             CAST(SUM(n_s) - SUM(pos_s) AS BIGINT) AS n_neg,
             SUM(pos_s * (below_s + (n_s + 1) / 2.0)) AS r_pos
      FROM ranked
    )
    SELECT n_pos, n_neg,
           ROUND((r_pos - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * CAST(n_neg AS DOUBLE)), {round_to}) AS auc
    FROM agg
    """


def welch_ttest(
    df: DataFrame,
    value: Column,
    group: Column,
    group_a: str,
    group_b: str,
    round_to: int = 4,
) -> DataFrame:
    """Welch's unequal-variance t-test between two cohorts.

    One conditional-aggregate pass: means, sample variances, t statistic
    and Welch–Satterthwaite degrees of freedom. Output: one row
    (n_a, n_b, mean_a, mean_b, t_stat, dof).
    """
    va = F.when(group == group_a, value)
    vb = F.when(group == group_b, value)
    agg = df.agg(
        F.count(va).cast("long").alias("n_a"),
        F.count(vb).cast("long").alias("n_b"),
        F.avg(va).alias("mean_a"),
        F.avg(vb).alias("mean_b"),
        F.var_samp(va).alias("var_a"),
        F.var_samp(vb).alias("var_b"),
    )
    sa = F.col("var_a") / F.col("n_a")
    sb = F.col("var_b") / F.col("n_b")
    return agg.select(
        "n_a",
        "n_b",
        F.round("mean_a", round_to).alias("mean_a"),
        F.round("mean_b", round_to).alias("mean_b"),
        F.round(
            (F.col("mean_a") - F.col("mean_b")) / F.sqrt(sa + sb), round_to
        ).alias("t_stat"),
        F.round(
            F.pow(sa + sb, 2)
            / (
                F.pow(sa, 2) / (F.col("n_a") - 1)
                + F.pow(sb, 2) / (F.col("n_b") - 1)
            ),
            round_to,
        ).alias("dof"),
    )


def welch_ttest_sql(
    table: str,
    value: str,
    group: str,
    group_a: str,
    group_b: str,
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`welch_ttest`."""
    va = f"CASE WHEN {group} = '{group_a}' THEN {value} END"
    vb = f"CASE WHEN {group} = '{group_b}' THEN {value} END"
    return f"""
    WITH agg AS (
      SELECT CAST(COUNT({va}) AS BIGINT) AS n_a,
             CAST(COUNT({vb}) AS BIGINT) AS n_b,
             AVG({va}) AS mean_a, AVG({vb}) AS mean_b,
             VAR_SAMP({va}) AS var_a, VAR_SAMP({vb}) AS var_b
      FROM {table}
    )
    SELECT n_a, n_b,
           ROUND(mean_a, {round_to}) AS mean_a,
           ROUND(mean_b, {round_to}) AS mean_b,
           ROUND((mean_a - mean_b)
                 / SQRT(var_a / n_a + var_b / n_b), {round_to}) AS t_stat,
           ROUND(POW(var_a / n_a + var_b / n_b, 2)
                 / (POW(var_a / n_a, 2) / (n_a - 1)
                    + POW(var_b / n_b, 2) / (n_b - 1)), {round_to}) AS dof
    FROM agg
    """


def ndcg_at_k(
    df: DataFrame,
    qid_col: str = "qid",
    score_col: str = "score",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """NDCG@k per query over (qid, score, rel) candidate rows — the
    standard graded ranking metric (Jarvelin & Kekalainen 2002),
    exponential-gain form: DCG = sum (2^rel - 1)/log2(rank + 1) over
    the top-k by score, IDCG the same over the ideal (rel-sorted)
    ordering, NDCG = DCG/IDCG.

    Ties break deterministically (score desc, then the natural row
    order column passed as part of ``score_col`` ordering is NOT
    assumed — callers must pre-round or accept engine-stable ties on
    qid/rel). Both windows share one shuffle on qid, and they run over
    CANDIDATE counts per query, never the corpus. Output:
    (qid, dcg, idcg, ndcg).
    """
    w_score = Window.partitionBy(qid_col).orderBy(
        F.col(score_col).desc(), F.col(rel_col).desc()
    )
    w_ideal = Window.partitionBy(qid_col).orderBy(
        F.col(rel_col).desc(), F.col(score_col).desc()
    )
    gain = F.pow(F.lit(2.0), F.col(rel_col)) - 1
    ranked = df.select(
        F.col(qid_col).alias("qid"),
        F.row_number().over(w_score).alias("__r"),
        F.row_number().over(w_ideal).alias("__ri"),
        gain.alias("__g"),
    )
    dcg = F.sum(
        F.when(F.col("__r") <= k, F.col("__g") / F.log2(F.col("__r") + 1)).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(F.col("__ri") <= k, F.col("__g") / F.log2(F.col("__ri") + 1)).otherwise(0.0)
    )
    # all-zero-relevance queries: dcg/idcg = 0/0 -> conventional 0.0,
    # not a silent NULL
    return ranked.groupBy("qid").agg(
        dcg.alias("dcg"),
        idcg.alias("idcg"),
        F.when(idcg > 0, dcg / idcg).otherwise(0.0).alias("ndcg"),
    )
