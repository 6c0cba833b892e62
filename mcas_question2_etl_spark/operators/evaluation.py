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


def anova_f(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA F over a 2-decimal measure: does the group mean
    differ across k groups? (The k-group generalization of
    :func:`welch_ttest`'s 2-group comparison, classic pooled-variance
    form.)

    Determinism discipline (r8, VERDICT r7 #1): per-group moments are
    EXACT decimal sums (the measure is 2-decimal so x is
    DECIMAL(18,2)-exact and x*x is DECIMAL(38,4)-exact — order-free in
    any engine), and EVERY outer aggregation level is order-free too:
    Σn (bigint) and ΣΣx, ΣΣx² (decimal) stay exact, and the single
    double-valued reduction T = Σ_g s_g²/n_g — the r7 knife edge, an
    unordered double sum at |x|~3e15 under ROUND(x,6) — is a LEFT FOLD
    over the k per-group terms in sorted group-key order, identically
    in Spark (``sort_array(collect_list(struct)) → aggregate()``) and
    DuckDB (``LIST(… ORDER BY g) → list_reduce``). Then
    ss_within = double(Σs2) - T and ss_between = T - S²/N are single
    IEEE operations on bit-identical inputs: bit-reproducible across
    partitionings and engines.

    Output contract (re-cut in r8): the EXTENSIVE sums of squares are
    not emitted raw — at |ss|~3e14, ``ROUND(x, 6)`` itself diverges
    cross-engine even on bit-identical doubles, because DuckDB rounds
    via ``x*1e6`` (not exact above 2^53/1e6 = 9.0e9) while Spark
    rounds the shortest decimal repr. Instead the outputs are the
    INTENSIVE effect size ``eta_squared = ssb/(ssb+ssw)`` in [0,1] and
    ``f_stat`` (O(1..1e3)) — the press_rmse precedent — both orders of
    magnitude inside the exact-ROUND regime in both engines.

    Output (one row): (k, n, eta_squared, f_stat).
    Scale shape: one map-side-combined aggregate to k rows, then a
    k-row reduction — the corpus is scanned once, nothing else moves.
    The collect_list is over k groups (the test-factor cardinality),
    never the corpus.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__s"),
        F.sum(
            F.col(value_col).cast("decimal(18,2)")
            * F.col(value_col).cast("decimal(18,2)")
        ).alias("__s2"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__n").alias("n"),
        F.sum("__s").alias("__S_dec"),
        F.sum("__s2").alias("__S2_dec"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(group_col).alias("g"),
                    F.col("__n").alias("gn"),
                    F.col("__s").alias("gs"),
                )
            )
        ).alias("__groups"),
    )
    # T = Σ s_g²/n_g, folded left-to-right in sorted group-key order
    t_fold = F.aggregate(
        F.transform(
            F.col("__groups"),
            lambda x: x["gs"].cast("double")
            * x["gs"].cast("double")
            / x["gn"].cast("double"),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    agg = agg.select(
        "k",
        "n",
        F.col("__S_dec").cast("double").alias("__S"),
        F.col("__S2_dec").cast("double").alias("__S2"),
        t_fold.alias("__T"),
    )
    ssb = F.col("__T") - F.col("__S") * F.col("__S") / F.col("n").cast("double")
    ssw = F.col("__S2") - F.col("__T")
    f_stat = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    return agg.select(
        "k",
        "n",
        F.round(ssb / (ssb + ssw), round_to).alias("eta_squared"),
        F.round(f_stat, round_to).alias("f_stat"),
    )


def anova_f_sql(
    table: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`anova_f` — mirrors the sorted-group-key
    left fold of the double terms (``LIST(… ORDER BY g)`` +
    ``list_reduce``) so T accumulates in the same order with the same
    IEEE operations as Spark's ``aggregate()`` fold."""
    return f"""
    WITH per AS (
      SELECT {group_col} AS g,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST({value_col} AS DECIMAL(18,2))) AS s,
             SUM(CAST({value_col} AS DECIMAL(18,2))
                 * CAST({value_col} AS DECIMAL(18,2))) AS s2
      FROM {table} GROUP BY 1
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(s) AS DOUBLE) AS S,
             CAST(SUM(s2) AS DOUBLE) AS S2,
             list_reduce(
               list_prepend(
                 CAST(0.0 AS DOUBLE),
                 LIST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE) ORDER BY g)),
               (acc, t) -> acc + t) AS T
      FROM per
    )
    SELECT k, n,
           ROUND((T - S * S / CAST(n AS DOUBLE))
                 / ((T - S * S / CAST(n AS DOUBLE)) + (S2 - T)),
                 {round_to}) AS eta_squared,
           ROUND(((T - S * S / CAST(n AS DOUBLE))
                  / CAST(k - 1 AS DOUBLE))
                 / ((S2 - T) / CAST(n - k AS DOUBLE)),
                 {round_to}) AS f_stat
    FROM agg
    """


def spearman_corr(
    df: DataFrame,
    group_col: str,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Per-group Spearman rank correlation between two columns —
    Pearson's formula over AVERAGE ranks (the tie-correct form, not
    the 6*sum d^2 shortcut, which is wrong under ties).

    Rank-space trick for exactness: the average rank of a tie run
    [r, r+c-1] is r + (c-1)/2, so DOUBLED average ranks
    2r + (c - 1) are INTEGERS. Pearson is scale-invariant, so the
    correlation of the doubled ranks equals Spearman's rho, and every
    moment (sums, sums of squares/products of bigints) accumulates
    exactly in DECIMAL(38,0) — order-free across engines. Only the
    final rho ratio runs in double on bit-identical inputs: no
    rounding needed at all.

    Scale shape: two rank windows sharing ONE shuffle on the group
    key, then a map-side-combined aggregate. Within-group rank windows
    assume groups fit a task (the repo's two-phase global rank is the
    fallback for a single giant group).
    """
    wa = Window.partitionBy(group_col).orderBy(col_a)
    wb = Window.partitionBy(group_col).orderBy(col_b)
    ca = Window.partitionBy(group_col, col_a)
    cb = Window.partitionBy(group_col, col_b)
    # doubled average rank = 2*rank() + (tie_count - 1), an exact bigint
    ranked = df.select(
        F.col(group_col),
        (
            2 * F.rank().over(wa) + F.count(F.lit(1)).over(ca) - 1
        ).cast("bigint").alias("__ra"),
        (
            2 * F.rank().over(wb) + F.count(F.lit(1)).over(cb) - 1
        ).cast("bigint").alias("__rb"),
    )
    dec = "decimal(38,0)"
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("__ra").cast(dec)).alias("__sa"),
        F.sum(F.col("__rb").cast(dec)).alias("__sb"),
        F.sum((F.col("__ra") * F.col("__ra")).cast(dec)).alias("__saa"),
        F.sum((F.col("__rb") * F.col("__rb")).cast(dec)).alias("__sbb"),
        F.sum((F.col("__ra") * F.col("__rb")).cast(dec)).alias("__sab"),
    )
    n = F.col("n").cast("double")
    sa = F.col("__sa").cast("double")
    sb = F.col("__sb").cast("double")
    num = n * F.col("__sab").cast("double") - sa * sb
    den = F.sqrt(
        (n * F.col("__saa").cast("double") - sa * sa)
        * (n * F.col("__sbb").cast("double") - sb * sb)
    )
    return agg.select(
        group_col,
        "n",
        F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("spearman_rho"),
    )


def spearman_corr_sql(
    table: str,
    group_col: str,
    col_a: str,
    col_b: str,
) -> str:
    """DuckDB twin of :func:`spearman_corr`."""
    return f"""
    WITH ranked AS (
      SELECT {group_col},
             CAST(2 * rank() OVER (PARTITION BY {group_col} ORDER BY {col_a})
                  + COUNT(*) OVER (PARTITION BY {group_col}, {col_a}) - 1
                  AS BIGINT) AS ra,
             CAST(2 * rank() OVER (PARTITION BY {group_col} ORDER BY {col_b})
                  + COUNT(*) OVER (PARTITION BY {group_col}, {col_b}) - 1
                  AS BIGINT) AS rb
      FROM {table}
    ),
    agg AS (
      SELECT {group_col},
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ra AS DECIMAL(38,0))) AS sa,
             SUM(CAST(rb AS DECIMAL(38,0))) AS sb,
             SUM(CAST(ra * ra AS DECIMAL(38,0))) AS saa,
             SUM(CAST(rb * rb AS DECIMAL(38,0))) AS sbb,
             SUM(CAST(ra * rb AS DECIMAL(38,0))) AS sab
      FROM ranked GROUP BY {group_col}
    )
    SELECT {group_col}, n,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) > 0
                THEN (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                      - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                               - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
                ELSE 0.0 END AS spearman_rho
    FROM agg
    """


def contingency_residuals(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Full contingency-table audit for two categoricals: per-cell
    observed/expected/standardized residual ((o - e)/sqrt(e) — which
    cells drive the dependence), plus the table-level chi-square and
    Cramer's V repeated on every row (V = sqrt(chi2 / (N * min(r-1,
    c-1))), the [0,1]-normalized effect size chi-square alone lacks).

    Determinism: marginals and N are exact bigints; each cell's
    expected = r*c/N and residual are single IEEE expressions on those
    (exact products < 2^53), so per-cell values need no rounding. Only
    chi2 SUMS float cell terms (cells = r*c rows, a tiny table, but
    still order-free only after rounding) — chi2 and V are rounded at
    ``round_to`` like the other test statistics.

    Scale shape: one (row, col) count aggregation over the corpus with
    map-side combine; marginals derive from the CELL table (never a
    second corpus scan) and broadcast back; chi2 is a scalar aggregate
    of the cell table broadcast onto it.
    """
    cells = df.groupBy(
        F.col(row_col).alias("__r"), F.col(col_col).alias("__c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    row_m = cells.groupBy("__r").agg(F.sum("n_obs").alias("__rn"))
    col_m = cells.groupBy("__c").agg(F.sum("n_obs").alias("__cn"))
    tot = cells.agg(
        F.sum("n_obs").cast("bigint").alias("__N"),
        F.countDistinct("__r").alias("__nr"),
        F.countDistinct("__c").alias("__nc"),
    )
    based = (
        cells.join(F.broadcast(row_m), "__r")
        .join(F.broadcast(col_m), "__c")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "expected",
            F.col("__rn").cast("double") * F.col("__cn") / F.col("__N"),
        )
        .withColumn(
            "std_residual",
            (F.col("n_obs") - F.col("expected")) / F.sqrt(F.col("expected")),
        )
    )
    stats = based.agg(
        F.round(
            F.sum(F.col("std_residual") * F.col("std_residual")), round_to
        ).alias("chi2"),
        F.round(
            F.sqrt(
                F.sum(F.col("std_residual") * F.col("std_residual"))
                / (
                    F.max("__N")
                    * F.least(F.max("__nr") - 1, F.max("__nc") - 1)
                )
            ),
            round_to,
        ).alias("cramers_v"),
    )
    return based.crossJoin(F.broadcast(stats)).select(
        F.col("__r").alias(row_col),
        F.col("__c").alias(col_col),
        "n_obs",
        "expected",
        "std_residual",
        "chi2",
        "cramers_v",
    )


def contingency_residuals_sql(
    table: str,
    row_col: str,
    col_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`contingency_residuals`."""
    return f"""
    WITH cells AS (
      SELECT {row_col} AS r, {col_col} AS c, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM {table} GROUP BY 1, 2
    ),
    rm AS (SELECT r, CAST(SUM(n_obs) AS BIGINT) AS rn FROM cells GROUP BY r),
    cm AS (SELECT c, CAST(SUM(n_obs) AS BIGINT) AS cn FROM cells GROUP BY c),
    t AS (
      SELECT CAST(SUM(n_obs) AS BIGINT) AS N,
             CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS nc
      FROM cells
    ),
    based AS (
      SELECT cells.r, cells.c, cells.n_obs,
             CAST(rm.rn AS DOUBLE) * cm.cn / t.N AS expected,
             (cells.n_obs - CAST(rm.rn AS DOUBLE) * cm.cn / t.N)
               / sqrt(CAST(rm.rn AS DOUBLE) * cm.cn / t.N) AS std_residual,
             t.N, t.nr, t.nc
      FROM cells
      JOIN rm ON rm.r = cells.r
      JOIN cm ON cm.c = cells.c
      CROSS JOIN t
    ),
    stats AS (
      SELECT ROUND(SUM(std_residual * std_residual), {round_to}) AS chi2,
             ROUND(sqrt(SUM(std_residual * std_residual)
                        / (MAX(N) * least(MAX(nr) - 1, MAX(nc) - 1))),
                   {round_to}) AS cramers_v
      FROM based
    )
    SELECT b.r AS {row_col}, b.c AS {col_col}, b.n_obs,
           b.expected, b.std_residual, s.chi2, s.cramers_v
    FROM based b CROSS JOIN stats s
    """


def kruskal_wallis(
    df: DataFrame,
    label_col: str,
    value_col: str,
    round_to: int = 9,
) -> DataFrame:
    """Kruskal-Wallis H test — "does ``value_col``'s distribution
    differ across the k groups of ``label_col``" without any normality
    assumption (the k-sample generalization of Mann-Whitney; the
    nonparametric sibling of :func:`anova_f`).

    Rank exactness (same device as :func:`spearman_corr`): pooled
    ranking happens at the VALUE GRAIN — ``groupBy(value)`` counts,
    one ordered window over the distinct-value rollup yields each
    value's DOUBLED average rank ``2*cum_before + cnt + 1``, an exact
    bigint. Per-group doubled rank sums then accumulate in
    DECIMAL(38,0) from the (label, value) contingency rollup; only H
    itself runs in double, and it is ROUNDed (default 9 dp) because a
    k-term double sum's addend order differs across engines.

    Tie correction: ``H_adj = H / (1 - sum(t^3 - t)/(N^3 - N))`` with
    t the per-value tie counts — mandatory for discrete data like
    document lengths, where ties dominate.

    Scale shape: two scans collapse the corpus to (value) and
    (label, value) rollups; the ordered window runs over the DISTINCT
    VALUE table only (bounded by value cardinality — for a truly
    unbounded continuous column, swap in the repo's two-phase global
    rank). Output: one row per label, H/H_adj/df broadcast onto each.

    Beyond-reference (SURVEY §2.13): the reference's analysis story is
    parametric (run_analysis.Rmd's GLM); this adds the distribution-
    free comparison a corpus QA report needs.
    """
    vals = df.groupBy(F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    wv = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    # doubled average pooled rank of every row holding value v
    ranked_vals = vals.select(
        "__v",
        "__cnt",
        (
            2 * F.coalesce(F.sum("__cnt").over(wv), F.lit(0))
            + F.col("__cnt")
            + 1
        ).cast("bigint").alias("__dr"),
        ((F.col("__cnt") * F.col("__cnt") * F.col("__cnt")) - F.col("__cnt"))
        .cast("decimal(38,0)")
        .alias("__tie"),
    )
    cells = df.groupBy(
        F.col(label_col).alias("__lbl"), F.col(value_col).alias("__v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    dec = "decimal(38,0)"
    per_label = (
        cells.join(F.broadcast(ranked_vals.select("__v", "__dr")), "__v")
        .groupBy("__lbl")
        .agg(
            F.sum("__n").cast("bigint").alias("n"),
            F.sum((F.col("__n") * F.col("__dr")).cast(dec)).alias("__r2"),
        )
    )
    totals = ranked_vals.agg(
        F.sum("__cnt").cast("bigint").alias("__N"),
        F.sum("__tie").cast(dec).alias("__T"),
    )
    # H = 12/(N(N+1)) * sum_s (R_s^2 / n_s) - 3(N+1), R_s = __r2/2
    nd = F.col("__N").cast("double")
    r = F.col("__r2").cast("double") / 2
    stats = (
        per_label.crossJoin(F.broadcast(totals))
        .select(
            "__lbl",
            "n",
            (r * r / F.col("n")).alias("__term"),
            "__N",
            "__T",
        )
    )
    hsum = stats.agg(
        F.sum("__term").alias("__ssum"),
        F.max(nd).alias("__Nd"),
        F.max(F.col("__T").cast("double")).alias("__Td"),
        F.count(F.lit(1)).cast("bigint").alias("__k"),
    ).select(
        F.round(
            12 / (F.col("__Nd") * (F.col("__Nd") + 1)) * F.col("__ssum")
            - 3 * (F.col("__Nd") + 1),
            round_to,
        ).alias("__h"),
        (
            1
            - F.col("__Td")
            / (F.col("__Nd") * F.col("__Nd") * F.col("__Nd") - F.col("__Nd"))
        ).alias("__c"),
        (F.col("__k") - 1).cast("bigint").alias("df"),
    )
    return (
        per_label.crossJoin(F.broadcast(hsum))
        .select(
            F.col("__lbl").alias(label_col),
            "n",
            # mean pooled rank = R_s / n_s, single exact-input division
            (F.col("__r2").cast("double") / 2 / F.col("n")).alias("mean_rank"),
            F.col("__h").alias("h_stat"),
            F.round(F.col("__h") / F.col("__c"), round_to).alias("h_adj"),
            "df",
        )
    )


def kruskal_wallis_sql(
    table: str,
    label_col: str,
    value_col: str,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`kruskal_wallis`."""
    return f"""
    WITH vals AS (
      SELECT {value_col} AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table} GROUP BY 1
    ),
    ranked AS (
      SELECT v, cnt,
             CAST(2 * COALESCE(SUM(cnt) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + cnt + 1 AS BIGINT) AS dr,
             CAST(cnt * cnt * cnt - cnt AS DECIMAL(38,0)) AS tie
      FROM vals
    ),
    cells AS (
      SELECT {label_col} AS lbl, {value_col} AS v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} GROUP BY 1, 2
    ),
    per_label AS (
      SELECT cells.lbl, CAST(SUM(cells.n) AS BIGINT) AS n,
             SUM(CAST(cells.n * ranked.dr AS DECIMAL(38,0))) AS r2
      FROM cells JOIN ranked ON ranked.v = cells.v
      GROUP BY cells.lbl
    ),
    totals AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS N,
             CAST(SUM(tie) AS DECIMAL(38,0)) AS T
      FROM ranked
    ),
    stats AS (
      SELECT SUM((CAST(r2 AS DOUBLE) / 2) * (CAST(r2 AS DOUBLE) / 2)
                 / per_label.n) AS ssum,
             MAX(CAST(totals.N AS DOUBLE)) AS Nd,
             MAX(CAST(totals.T AS DOUBLE)) AS Td,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM per_label CROSS JOIN totals
    ),
    h AS (
      SELECT ROUND(12 / (Nd * (Nd + 1)) * ssum - 3 * (Nd + 1), {round_to})
               AS h_stat,
             1 - Td / (Nd * Nd * Nd - Nd) AS c,
             CAST(k - 1 AS BIGINT) AS df
      FROM stats
    )
    SELECT per_label.lbl AS {label_col}, per_label.n,
           CAST(r2 AS DOUBLE) / 2 / per_label.n AS mean_rank,
           h.h_stat,
           ROUND(h.h_stat / h.c, {round_to}) AS h_adj,
           h.df
    FROM per_label CROSS JOIN h
    """


def bh_adjust(
    pvals: DataFrame,
    key_col: str,
    p_col: str,
    round_to: int = 9,
) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment over a table of per-key
    p-values — the multiple-testing control every "run this test per
    group" operator in the repo (welch/KS/Mann-Kendall/Pettitt)
    needs before anyone acts on its smallest p.

    Step-up: sort p ascending, q_i = p_i * m / i, adjusted
    p_i = min(1, min_{j>=i} q_j). Ranking ties break on the key so
    both engines sort identically even when two keys share an exact
    p. The adjusted value is ROUNDed (default 9dp): q and the
    reverse running-min are fixed IEEE expressions, but upstream p's
    that went through libm (exp/ln) can differ in the last ulp.

    Scale: the p table is per-KEY (groups, not rows) — window over m
    rows. Output: (key, p, p_rank, p_adj).
    """
    m = pvals.select(F.count(F.lit(1)).cast("bigint").alias("__m"))
    ranked = pvals.crossJoin(F.broadcast(m)).select(
        F.col(key_col),
        F.col(p_col),
        "__m",
        F.row_number()
        .over(Window.orderBy(F.col(p_col), F.col(key_col)))
        .cast("bigint")
        .alias("p_rank"),
    )
    wrev = Window.orderBy(
        F.col(p_col).desc(), F.col(key_col).desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q = F.col(p_col) * F.col("__m") / F.col("p_rank")
    return ranked.select(
        key_col,
        p_col,
        "p_rank",
        F.round(F.least(F.min(q).over(wrev), F.lit(1.0)), round_to).alias(
            "p_adj"
        ),
    )


def bh_adjust_sql(
    pvals_sql: str,
    key_col: str,
    p_col: str,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`bh_adjust`; ``pvals_sql`` must yield
    (key_col, p_col)."""
    return f"""
    WITH pv AS ({pvals_sql}),
    ranked AS (
      SELECT {key_col}, {p_col},
             CAST(COUNT(*) OVER () AS BIGINT) AS m,
             CAST(row_number() OVER (ORDER BY {p_col}, {key_col})
                  AS BIGINT) AS p_rank
      FROM pv
    )
    SELECT {key_col}, {p_col}, p_rank,
           ROUND(least(MIN({p_col} * m / p_rank) OVER
                         (ORDER BY {p_col} DESC, {key_col} DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       1.0), {round_to}) AS p_adj
    FROM ranked
    """


def g_test(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_to: int = 9,
) -> DataFrame:
    """G-test of independence (log-likelihood ratio) over a two-way
    contingency table — the chi-square alternative that is additive
    across partitions of the table (its decomposability is why corpus
    drift monitors prefer it): G = 2 * sum O * ln(O/E), E = row*col/N.

    Zero cells are preserved in the output (contribution 0) via the
    same marginal cross-join device as ``contingency_residuals``.
    Per-cell contributions are single IEEE expressions on exact
    integer marginals; G and p-inputs round at ``round_to`` because
    ln may differ in the last ulp across engines and the k-cell sum
    order differs. Output: one row per (row, col) cell with n_obs,
    expected, g_contrib, plus broadcast g_stat and dof.
    """
    cells = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    rm = cells.groupBy("r").agg(F.sum("n_obs").cast("bigint").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("n_obs").cast("bigint").alias("cn"))
    tot = cells.agg(
        F.sum("n_obs").cast("bigint").alias("N"),
        F.countDistinct("r").cast("bigint").alias("nr"),
        F.countDistinct("c").cast("bigint").alias("nc"),
    )
    grid = rm.crossJoin(cm).join(cells, ["r", "c"], "left").na.fill(
        {"n_obs": 0}
    )
    based = grid.crossJoin(F.broadcast(tot)).select(
        "r",
        "c",
        "n_obs",
        (
            F.col("rn").cast("double") * F.col("cn") / F.col("N")
        ).alias("expected"),
        "N",
        "nr",
        "nc",
    )
    contrib = F.when(
        F.col("n_obs") > 0,
        2
        * F.col("n_obs").cast("double")
        * F.log(F.col("n_obs").cast("double") / F.col("expected")),
    ).otherwise(F.lit(0.0))
    withc = based.select(
        "r", "c", "n_obs", "expected", contrib.alias("g_contrib"), "nr", "nc"
    )
    stats = withc.agg(
        F.round(F.sum("g_contrib"), round_to).alias("g_stat"),
        ((F.max("nr") - 1) * (F.max("nc") - 1)).cast("bigint").alias("dof"),
    )
    return withc.crossJoin(F.broadcast(stats)).select(
        F.col("r").alias(row_col),
        F.col("c").alias(col_col),
        "n_obs",
        "expected",
        "g_contrib",
        "g_stat",
        "dof",
    )


def g_test_sql(
    table: str,
    row_col: str,
    col_col: str,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`g_test`."""
    return f"""
    WITH cells AS (
      SELECT {row_col} AS r, {col_col} AS c, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM {table} GROUP BY 1, 2
    ),
    rm AS (SELECT r, CAST(SUM(n_obs) AS BIGINT) AS rn FROM cells GROUP BY r),
    cm AS (SELECT c, CAST(SUM(n_obs) AS BIGINT) AS cn FROM cells GROUP BY c),
    tot AS (
      SELECT CAST(SUM(n_obs) AS BIGINT) AS N,
             CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS nc
      FROM cells
    ),
    grid AS (
      SELECT rm.r, cm.c, COALESCE(cells.n_obs, 0) AS n_obs, rm.rn, cm.cn
      FROM rm CROSS JOIN cm
      LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c
    ),
    based AS (
      SELECT grid.r, grid.c, grid.n_obs,
             CAST(grid.rn AS DOUBLE) * grid.cn / tot.N AS expected,
             tot.nr, tot.nc
      FROM grid CROSS JOIN tot
    ),
    withc AS (
      SELECT r, c, n_obs, expected,
             CASE WHEN n_obs > 0
                  THEN 2 * CAST(n_obs AS DOUBLE)
                       * ln(CAST(n_obs AS DOUBLE) / expected)
                  ELSE 0.0 END AS g_contrib,
             nr, nc
      FROM based
    ),
    stats AS (
      SELECT ROUND(SUM(g_contrib), {round_to}) AS g_stat,
             CAST((MAX(nr) - 1) * (MAX(nc) - 1) AS BIGINT) AS dof
      FROM withc
    )
    SELECT withc.r AS {row_col}, withc.c AS {col_col}, withc.n_obs,
           withc.expected, withc.g_contrib, stats.g_stat, stats.dof
    FROM withc CROSS JOIN stats
    """


def cohens_kappa(
    df: DataFrame,
    gate_a: Column,
    gate_b: Column,
) -> DataFrame:
    """Cohen's kappa between two boolean raters/gates — chance-
    corrected agreement. The corpus-QA use: when two document filters
    (a length gate and a vocabulary gate, a heuristic and a model)
    mostly agree, raw agreement overstates their interchangeability;
    kappa subtracts the agreement their marginal rates alone would
    produce: kappa = (po - pe) / (1 - pe).

    One conditional-aggregate pass over exact bigint cell counts;
    po/pe/kappa are single IEEE expressions — no rounding needed.
    Output: one row (n11, n10, n01, n00, po, pe, kappa).
    """
    a = gate_a.cast("int")
    b = gate_b.cast("int")
    agg = df.agg(
        F.sum(a * b).cast("bigint").alias("n11"),
        F.sum(a * (1 - b)).cast("bigint").alias("n10"),
        F.sum((1 - a) * b).cast("bigint").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("bigint").alias("n00"),
    )
    n = (
        F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")
    ).cast("double")
    po = (F.col("n11") + F.col("n00")) / n
    pa = (F.col("n11") + F.col("n10")) / n
    pb = (F.col("n11") + F.col("n01")) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    return agg.select(
        "n11",
        "n10",
        "n01",
        "n00",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (1 - pe)).alias("kappa"),
    )


def cohens_kappa_sql(
    table: str,
    gate_a_sql: str,
    gate_b_sql: str,
) -> str:
    """DuckDB twin of :func:`cohens_kappa`; gate args are boolean SQL
    expressions over ``table``'s columns."""
    return f"""
    WITH agg AS (
      SELECT
        CAST(SUM(CASE WHEN ({gate_a_sql}) AND ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(SUM(CASE WHEN ({gate_a_sql}) AND NOT ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(SUM(CASE WHEN NOT ({gate_a_sql}) AND ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(SUM(CASE WHEN NOT ({gate_a_sql}) AND NOT ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM {table}
    )
    SELECT n11, n10, n01, n00,
           (n11 + n00) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po,
           ((n11 + n10) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
             * ((n11 + n01) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
           + (1 - (n11 + n10) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
             * (1 - (n11 + n01) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
             AS pe,
           ((n11 + n00) / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
            - (((n11 + n10) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
               * ((n11 + n01) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
               + (1 - (n11 + n10) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
                 * (1 - (n11 + n01) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))))
           / (1 - (((n11 + n10) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
                   * ((n11 + n01) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
                   + (1 - (n11 + n10) / CAST(n11 + n10 + n01 + n00 AS DOUBLE))
                     * (1 - (n11 + n01)
                        / CAST(n11 + n10 + n01 + n00 AS DOUBLE))))
             AS kappa
    FROM agg
    """


def ratio_metric_ab_test(
    df: DataFrame,
    unit_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    num_col: str,
    den_count: bool = True,
) -> DataFrame:
    """Two-sample z-test for a RATIO metric with the delta method —
    the experimentation-platform workhorse for metrics like
    revenue-per-order or clicks-per-session where the randomization
    unit (user) differs from the metric denominator (order): naive
    per-row variance is wrong because rows within a unit correlate;
    the delta method computes var of (sum X_u / sum Y_u) from
    per-UNIT moments (Deng et al., KDD 2018 formulation):

        R = X-bar / Y-bar,
        var(R) ~ (var_x - 2 R cov_xy + R^2 var_y) / (k * ybar^2)

    Exactness: per-unit numerators accumulate in DECIMAL(18,2) (the
    repo money discipline); the five cross-unit moments are DECIMAL
    products summed exactly, so every double that enters the fixed
    z expression is bit-identical across engines — no rounding.

    Output: one row (n_a, n_b, ratio_a, ratio_b, diff, se, z).
    """
    dec = "decimal(18,2)"
    per_unit = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .groupBy(F.col(unit_col).alias("u"), F.col(group_col).alias("g"))
        .agg(
            F.sum(F.col(num_col).cast(dec)).cast(dec).alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    mom = per_unit.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").cast("decimal(38,2)").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).alias("sxx"),
        F.sum(
            (F.col("x") * F.col("y").cast("decimal(18,0)")).cast(
                "decimal(38,2)"
            )
        ).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    k = F.col("k").cast("double")
    xbar = F.col("sx").cast("double") / k
    ybar = F.col("sy").cast("double") / k
    r = F.col("sx").cast("double") / F.col("sy")
    var_x = F.col("sxx").cast("double") / k - xbar * xbar
    var_y = F.col("syy").cast("double") / k - ybar * ybar
    cov = F.col("sxy").cast("double") / k - xbar * ybar
    vr = (var_x - 2 * r * cov + r * r * var_y) / (k * (ybar * ybar))
    stats = mom.select(
        "g", "k", r.alias("ratio"), vr.alias("vr")
    )
    a = stats.where(F.col("g") == group_a).select(
        F.col("k").alias("n_a"), F.col("ratio").alias("ratio_a"),
        F.col("vr").alias("__va"),
    )
    b = stats.where(F.col("g") == group_b).select(
        F.col("k").alias("n_b"), F.col("ratio").alias("ratio_b"),
        F.col("vr").alias("__vb"),
    )
    j = a.crossJoin(b)
    se = F.sqrt(F.col("__va") + F.col("__vb"))
    return j.select(
        "n_a",
        "n_b",
        "ratio_a",
        "ratio_b",
        (F.col("ratio_a") - F.col("ratio_b")).alias("diff"),
        se.alias("se"),
        ((F.col("ratio_a") - F.col("ratio_b")) / se).alias("z"),
    )


def ratio_metric_ab_test_sql(
    table_sql: str,
    unit_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    num_col: str,
) -> str:
    """DuckDB twin of :func:`ratio_metric_ab_test`; ``table_sql`` is a
    relation providing (unit_col, group_col, num_col) rows."""
    return f"""
    WITH per_unit AS (
      SELECT {unit_col} AS u, {group_col} AS g,
             CAST(SUM(CAST({num_col} AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM ({table_sql})
      WHERE {group_col} IN ('{group_a}', '{group_b}')
      GROUP BY 1, 2
    ),
    mom AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS DECIMAL(38,2)) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx,
             SUM(CAST(x * CAST(y AS DECIMAL(18,0)) AS DECIMAL(38,2))) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM per_unit GROUP BY g
    ),
    stats AS (
      SELECT g, k,
             CAST(sx AS DOUBLE) / sy AS ratio,
             (CAST(sxx AS DOUBLE) / CAST(k AS DOUBLE)
              - (CAST(sx AS DOUBLE) / CAST(k AS DOUBLE))
                * (CAST(sx AS DOUBLE) / CAST(k AS DOUBLE))
              - 2 * (CAST(sx AS DOUBLE) / sy)
                * (CAST(sxy AS DOUBLE) / CAST(k AS DOUBLE)
                   - (CAST(sx AS DOUBLE) / CAST(k AS DOUBLE))
                     * (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE)))
              + (CAST(sx AS DOUBLE) / sy) * (CAST(sx AS DOUBLE) / sy)
                * (CAST(syy AS DOUBLE) / CAST(k AS DOUBLE)
                   - (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))
                     * (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))))
             / (CAST(k AS DOUBLE)
                * ((CAST(sy AS DOUBLE) / CAST(k AS DOUBLE))
                   * (CAST(sy AS DOUBLE) / CAST(k AS DOUBLE)))) AS vr
      FROM mom
    )
    SELECT a.k AS n_a, b.k AS n_b, a.ratio AS ratio_a, b.ratio AS ratio_b,
           a.ratio - b.ratio AS diff,
           sqrt(a.vr + b.vr) AS se,
           (a.ratio - b.ratio) / sqrt(a.vr + b.vr) AS z
    FROM (SELECT * FROM stats WHERE g = '{group_a}') a
    CROSS JOIN (SELECT * FROM stats WHERE g = '{group_b}') b
    """


def srm_check(
    df: DataFrame,
    unit_col: str,
    n_arms: int = 2,
) -> DataFrame:
    """Sample-ratio-mismatch check for a hash-based experiment split:
    assign every distinct unit to one of ``n_arms`` arms with the
    repo's portable md5 bucketing, then chi-square goodness-of-fit
    against the equal-allocation expectation — the first diagnostic
    every A/B readout must pass (an SRM means the assignment or
    logging is broken and all downstream stats are void).

    Exact bigint arm counts; chi2 = sum (o - e)^2 / e is a k-term
    fixed expression per arm summed over k rows (k tiny, and each
    term is exact-input IEEE) — spelled identically in both engines.
    Flag at the 1%% critical value for k-1 df (hardcoded for k <= 5,
    the practical arm counts). Output: one row per arm
    (arm, n_units, expected, chi2, srm_flag).
    """
    from .sampling import hash_bucket

    crit = {1: 6.635, 2: 9.21, 3: 11.345, 4: 13.277}
    units = df.select(F.col(unit_col).alias("u")).distinct()
    arms = units.select(hash_bucket("u", n_arms).alias("arm"))
    counts = arms.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units")
    )
    tot = counts.agg(F.sum("n_units").cast("bigint").alias("__N"))
    based = counts.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n_units",
        (F.col("__N").cast("double") / n_arms).alias("expected"),
    )
    dev = (F.col("n_units") - F.col("expected"))
    chi = based.agg(
        F.sum(dev * dev / F.col("expected")).alias("chi2")
    )
    return based.crossJoin(F.broadcast(chi)).select(
        "arm",
        "n_units",
        "expected",
        "chi2",
        (F.col("chi2") > crit[n_arms - 1]).alias("srm_flag"),
    )


def srm_check_sql(
    table: str,
    unit_col: str,
    n_arms: int = 2,
) -> str:
    """DuckDB twin of :func:`srm_check`."""
    from .sampling import hash_bucket_sql

    crit = {1: 6.635, 2: 9.21, 3: 11.345, 4: 13.277}
    hb = hash_bucket_sql("u", n_arms)
    return f"""
    WITH units AS (SELECT DISTINCT {unit_col} AS u FROM {table}),
    arms AS (SELECT {hb} AS arm FROM units),
    counts AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_units FROM arms GROUP BY arm
    ),
    tot AS (SELECT CAST(SUM(n_units) AS BIGINT) AS N FROM counts),
    based AS (
      SELECT arm, n_units, CAST(N AS DOUBLE) / {n_arms} AS expected
      FROM counts CROSS JOIN tot
    ),
    chi AS (
      SELECT SUM((n_units - expected) * (n_units - expected) / expected)
               AS chi2
      FROM based
    )
    SELECT based.arm, based.n_units, based.expected, chi.chi2,
           chi.chi2 > {crit[n_arms - 1]} AS srm_flag
    FROM based CROSS JOIN chi
    """


def did_estimator(
    df: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    n_arms: int = 2,
) -> DataFrame:
    """Difference-in-differences estimator over an md5 2-arm unit
    split and the corpus's two time halves — the pre/post x
    treatment/control workhorse of causal measurement, with the SE
    computed correctly at the UNIT level (per-unit pre-to-post deltas,
    not pooled rows). On a hash split this is the placebo/AA harness:
    DiD should read ~0 and its z should be well-behaved.

    Metric: the unit's event count per period (exact bigints; units
    missing from a period count 0 via the unit x period grid). All
    moments — per-arm delta sums and squares — are exact integers, so
    mean/variance/z are fixed IEEE expressions with zero rounding.

    Output: one row (n_a, n_b, mean_a_pre, mean_a_post, mean_b_pre,
    mean_b_post, did, se, z).
    """
    from .sampling import hash_bucket

    span = df.agg(
        F.min(F.unix_micros(ts_col)).alias("__t0"),
        F.max(F.unix_micros(ts_col)).alias("__t1"),
    )
    tagged = df.crossJoin(F.broadcast(span)).select(
        F.col(unit_col).alias("u"),
        (
            F.unix_micros(ts_col) - F.col("__t0")
            >= F.expr("(__t1 - __t0) div 2")
        ).cast("int").alias("post"),
    )
    per_unit = tagged.groupBy("u").agg(
        F.sum(1 - F.col("post")).cast("bigint").alias("pre_x"),
        F.sum("post").cast("bigint").alias("post_x"),
    )
    armed = per_unit.select(
        (hash_bucket("u", n_arms) == 0).cast("int").alias("a"),
        "pre_x",
        "post_x",
        (F.col("post_x") - F.col("pre_x")).alias("d"),
    )
    mom = armed.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("pre_x").cast("bigint").alias("s_pre"),
        F.sum("post_x").cast("bigint").alias("s_post"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
    )
    k = F.col("k").cast("double")
    mean_d = F.col("sd").cast("double") / k
    var_d = F.col("sdd").cast("double") / k - mean_d * mean_d
    stats = mom.select(
        "a",
        "k",
        (F.col("s_pre").cast("double") / k).alias("mean_pre"),
        (F.col("s_post").cast("double") / k).alias("mean_post"),
        mean_d.alias("mean_d"),
        (var_d / k).alias("vm"),
    )
    a = stats.where(F.col("a") == 1).select(
        F.col("k").alias("n_a"),
        F.col("mean_pre").alias("mean_a_pre"),
        F.col("mean_post").alias("mean_a_post"),
        F.col("mean_d").alias("__da"),
        F.col("vm").alias("__va"),
    )
    b = stats.where(F.col("a") == 0).select(
        F.col("k").alias("n_b"),
        F.col("mean_pre").alias("mean_b_pre"),
        F.col("mean_post").alias("mean_b_post"),
        F.col("mean_d").alias("__db"),
        F.col("vm").alias("__vb"),
    )
    j = a.crossJoin(b)
    did = F.col("__da") - F.col("__db")
    se = F.sqrt(F.col("__va") + F.col("__vb"))
    return j.select(
        "n_a",
        "n_b",
        "mean_a_pre",
        "mean_a_post",
        "mean_b_pre",
        "mean_b_post",
        did.alias("did"),
        se.alias("se"),
        (did / se).alias("z"),
    )


def did_estimator_sql(
    table: str = "events",
    unit_col: str = "user_id",
    ts_col: str = "ts",
    n_arms: int = 2,
) -> str:
    """DuckDB twin of :func:`did_estimator`."""
    from .sampling import hash_bucket_sql

    hb = hash_bucket_sql("u", n_arms)
    return f"""
    WITH span AS (
      SELECT epoch_us(MIN({ts_col})) AS t0, epoch_us(MAX({ts_col})) AS t1
      FROM {table}
    ),
    tagged AS (
      SELECT {unit_col} AS u,
             CASE WHEN epoch_us({ts_col}) - span.t0
                       >= (span.t1 - span.t0) // 2
                  THEN 1 ELSE 0 END AS post
      FROM {table} CROSS JOIN span
    ),
    per_unit AS (
      SELECT u, CAST(SUM(1 - post) AS BIGINT) AS pre_x,
             CAST(SUM(post) AS BIGINT) AS post_x
      FROM tagged GROUP BY u
    ),
    armed AS (
      SELECT CASE WHEN ({hb}) = 0 THEN 1 ELSE 0 END AS a,
             pre_x, post_x, post_x - pre_x AS d
      FROM per_unit
    ),
    mom AS (
      SELECT a, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(pre_x) AS BIGINT) AS s_pre,
             CAST(SUM(post_x) AS BIGINT) AS s_post,
             CAST(SUM(d) AS BIGINT) AS sd,
             CAST(SUM(d * d) AS BIGINT) AS sdd
      FROM armed GROUP BY a
    ),
    stats AS (
      SELECT a, k,
             CAST(s_pre AS DOUBLE) / CAST(k AS DOUBLE) AS mean_pre,
             CAST(s_post AS DOUBLE) / CAST(k AS DOUBLE) AS mean_post,
             CAST(sd AS DOUBLE) / CAST(k AS DOUBLE) AS mean_d,
             (CAST(sdd AS DOUBLE) / CAST(k AS DOUBLE)
              - (CAST(sd AS DOUBLE) / CAST(k AS DOUBLE))
                * (CAST(sd AS DOUBLE) / CAST(k AS DOUBLE)))
             / CAST(k AS DOUBLE) AS vm
      FROM mom
    )
    SELECT a.k AS n_a, b.k AS n_b,
           a.mean_pre AS mean_a_pre, a.mean_post AS mean_a_post,
           b.mean_pre AS mean_b_pre, b.mean_post AS mean_b_post,
           a.mean_d - b.mean_d AS did,
           sqrt(a.vm + b.vm) AS se,
           (a.mean_d - b.mean_d) / sqrt(a.vm + b.vm) AS z
    FROM (SELECT * FROM stats WHERE a = 1) a
    CROSS JOIN (SELECT * FROM stats WHERE a = 0) b
    """


def cuped_adjusted_lift(
    df: DataFrame,
    unit_col: str = "user_id",
    ts_col: str = "ts",
    n_arms: int = 2,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): adjust each
    unit's post-period metric by theta * (pre - mean_pre) with theta
    = cov(pre, post) / var(pre) estimated pooled, then compare arm
    means — the standard way experiments shrink confidence intervals
    for free using pre-experiment data. On an md5 hash split this is
    the AA harness: the adjusted lift should stay ~0 while
    var_ratio = var(adjusted)/var(post) quantifies the reduction.

    Metric: per-unit event counts in the corpus's two time halves
    (exact bigints incl. the pre*post cross sums), so theta, the
    adjusted means, and the variance ratio are fixed IEEE
    expressions with zero rounding.

    Output: one row (n_a, n_b, theta, diff_raw, diff_adj,
    var_ratio).
    """
    from .sampling import hash_bucket

    span = df.agg(
        F.min(F.unix_micros(ts_col)).alias("__t0"),
        F.max(F.unix_micros(ts_col)).alias("__t1"),
    )
    tagged = df.crossJoin(F.broadcast(span)).select(
        F.col(unit_col).alias("u"),
        (
            F.unix_micros(ts_col) - F.col("__t0")
            >= F.expr("(__t1 - __t0) div 2")
        ).cast("int").alias("post"),
    )
    per_unit = tagged.groupBy("u").agg(
        F.sum(1 - F.col("post")).cast("bigint").alias("x"),
        F.sum("post").cast("bigint").alias("y"),
    )
    armed = per_unit.select(
        (hash_bucket("u", n_arms) == 0).cast("int").alias("a"), "x", "y"
    )
    pooled = armed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    n = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / n
    my = F.col("sy").cast("double") / n
    varx = F.col("sxx").cast("double") / n - mx * mx
    vary = F.col("syy").cast("double") / n - my * my
    cov = F.col("sxy").cast("double") / n - mx * my
    prior = pooled.select(
        F.when(varx > 0, cov / varx).otherwise(F.lit(0.0)).alias("theta"),
        mx.alias("mean_x"),
        vary.alias("var_y"),
        varx.alias("var_x"),
        cov.alias("cov_xy"),
    )
    adj = armed.crossJoin(F.broadcast(prior)).select(
        "a",
        "y",
        (
            F.col("y")
            - F.col("theta") * (F.col("x") - F.col("mean_x"))
        ).alias("ya"),
        "theta",
        "var_y",
        "var_x",
        "cov_xy",
    )
    per_arm = adj.groupBy("a", "theta", "var_y", "var_x", "cov_xy").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("ya").alias("sya"),
    )
    arm_stats = per_arm.select(
        "a",
        "k",
        "theta",
        "var_y",
        "var_x",
        "cov_xy",
        (F.col("sy").cast("double") / F.col("k")).alias("m_raw"),
        (F.col("sya") / F.col("k")).alias("m_adj"),
    )
    a = arm_stats.where(F.col("a") == 1).select(
        F.col("k").alias("n_a"),
        "theta",
        "var_y",
        "var_x",
        "cov_xy",
        F.col("m_raw").alias("__ra"),
        F.col("m_adj").alias("__aa"),
    )
    b = arm_stats.where(F.col("a") == 0).select(
        F.col("k").alias("n_b"),
        F.col("m_raw").alias("__rb"),
        F.col("m_adj").alias("__ab"),
    )
    # var(adjusted) = var_y - cov^2/var_x (the CUPED identity) — from
    # the pooled exact moments, not a second pass
    var_ratio = F.when(
        (F.col("var_y") > 0) & (F.col("var_x") > 0),
        (
            F.col("var_y")
            - F.col("cov_xy") * F.col("cov_xy") / F.col("var_x")
        )
        / F.col("var_y"),
    ).otherwise(F.lit(1.0))
    return a.crossJoin(b).select(
        "n_a",
        "n_b",
        "theta",
        (F.col("__ra") - F.col("__rb")).alias("diff_raw"),
        (F.col("__aa") - F.col("__ab")).alias("diff_adj"),
        var_ratio.alias("var_ratio"),
    )


def cuped_adjusted_lift_sql(
    table: str = "events",
    unit_col: str = "user_id",
    ts_col: str = "ts",
    n_arms: int = 2,
) -> str:
    """DuckDB twin of :func:`cuped_adjusted_lift`."""
    from .sampling import hash_bucket_sql

    hb = hash_bucket_sql("u", n_arms)
    return f"""
    WITH span AS (
      SELECT epoch_us(MIN({ts_col})) AS t0, epoch_us(MAX({ts_col})) AS t1
      FROM {table}
    ),
    tagged AS (
      SELECT {unit_col} AS u,
             CASE WHEN epoch_us({ts_col}) - span.t0
                       >= (span.t1 - span.t0) // 2
                  THEN 1 ELSE 0 END AS post
      FROM {table} CROSS JOIN span
    ),
    per_unit AS (
      SELECT u, CAST(SUM(1 - post) AS BIGINT) AS x,
             CAST(SUM(post) AS BIGINT) AS y
      FROM tagged GROUP BY u
    ),
    armed AS (
      SELECT CASE WHEN ({hb}) = 0 THEN 1 ELSE 0 END AS a, x, y
      FROM per_unit
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM armed
    ),
    prior AS (
      SELECT CASE WHEN (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) > 0
                  THEN (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
                        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                       / (CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
                          - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                            * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                  ELSE 0.0 END AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
             CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS var_y,
             CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS var_x,
             CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cov_xy
      FROM pooled
    ),
    adj AS (
      SELECT a, y, y - prior.theta * (x - prior.mean_x) AS ya,
             prior.theta, prior.var_y, prior.var_x, prior.cov_xy
      FROM armed CROSS JOIN prior
    ),
    per_arm AS (
      SELECT a, theta, var_y, var_x, cov_xy,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(y) AS BIGINT) AS sy, SUM(ya) AS sya
      FROM adj GROUP BY a, theta, var_y, var_x, cov_xy
    ),
    arm_stats AS (
      SELECT a, k, theta, var_y, var_x, cov_xy,
             CAST(sy AS DOUBLE) / k AS m_raw, sya / k AS m_adj
      FROM per_arm
    )
    SELECT a.k AS n_a, b.k AS n_b, a.theta,
           a.m_raw - b.m_raw AS diff_raw,
           a.m_adj - b.m_adj AS diff_adj,
           CASE WHEN a.var_y > 0 AND a.var_x > 0
                THEN (a.var_y - a.cov_xy * a.cov_xy / a.var_x) / a.var_y
                ELSE 1.0 END AS var_ratio
    FROM (SELECT * FROM arm_stats WHERE a = 1) a
    CROSS JOIN (SELECT * FROM arm_stats WHERE a = 0) b
    """


def mcnemar_gates(
    df: DataFrame,
    gate_a: Column,
    gate_b: Column,
) -> DataFrame:
    """McNemar's test for PAIRED binary raters — "do these two gates
    disagree symmetrically" on the SAME rows, which is the correct
    question when comparing two classifiers on one corpus (the
    unpaired chi-square wastes the pairing; Cohen's kappa measures
    agreement, McNemar tests the DIRECTION of disagreement). Uses
    only the discordant cells: chi2 = (b-c)^2/(b+c), plus the
    Edwards continuity-corrected (|b-c|-1)^2/(b+c).

    One conditional-aggregate pass, exact bigint cells, fixed IEEE
    statistics; b+c = 0 yields 0 by convention. Output: one row
    (n11, n10, n01, n00, chi2, chi2_corrected, significant).
    """
    a = gate_a.cast("int")
    b = gate_b.cast("int")
    agg = df.agg(
        F.sum(a * b).cast("bigint").alias("n11"),
        F.sum(a * (1 - b)).cast("bigint").alias("n10"),
        F.sum((1 - a) * b).cast("bigint").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("bigint").alias("n00"),
    )
    disc = (F.col("n10") + F.col("n01")).cast("double")
    diff = (F.col("n10") - F.col("n01")).cast("double")
    adiff = F.abs(F.col("n10") - F.col("n01")).cast("double")
    chi2 = F.when(disc > 0, diff * diff / disc).otherwise(F.lit(0.0))
    chi2c = F.when(
        disc > 0, (adiff - 1) * (adiff - 1) / disc
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n11",
        "n10",
        "n01",
        "n00",
        chi2.alias("chi2"),
        chi2c.alias("chi2_corrected"),
        (chi2 > 3.841).alias("significant"),
    )


def mcnemar_gates_sql(
    table: str,
    gate_a_sql: str,
    gate_b_sql: str,
) -> str:
    """DuckDB twin of :func:`mcnemar_gates`."""
    return f"""
    WITH agg AS (
      SELECT
        CAST(SUM(CASE WHEN ({gate_a_sql}) AND ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(SUM(CASE WHEN ({gate_a_sql}) AND NOT ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(SUM(CASE WHEN NOT ({gate_a_sql}) AND ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(SUM(CASE WHEN NOT ({gate_a_sql}) AND NOT ({gate_b_sql})
                 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM {table}
    )
    SELECT n11, n10, n01, n00,
           CASE WHEN n10 + n01 > 0
                THEN CAST(n10 - n01 AS DOUBLE) * CAST(n10 - n01 AS DOUBLE)
                     / CAST(n10 + n01 AS DOUBLE)
                ELSE 0.0 END AS chi2,
           CASE WHEN n10 + n01 > 0
                THEN (CAST(abs(n10 - n01) AS DOUBLE) - 1)
                     * (CAST(abs(n10 - n01) AS DOUBLE) - 1)
                     / CAST(n10 + n01 AS DOUBLE)
                ELSE 0.0 END AS chi2_corrected,
           CASE WHEN n10 + n01 > 0
                THEN CAST(n10 - n01 AS DOUBLE) * CAST(n10 - n01 AS DOUBLE)
                     / CAST(n10 + n01 AS DOUBLE)
                ELSE 0.0 END > 3.841 AS significant
    FROM agg
    """


# --------------------------------------------------------------------------
# Brier score with Murphy decomposition (train-calibrated binned forecast)
# --------------------------------------------------------------------------


def brier_decomposition(
    train: DataFrame,
    test: DataFrame,
    bin_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Brier score of the train-calibrated binned forecaster on the
    test set, with the exact Murphy (1973) decomposition
    ``brier = reliability - resolution + uncertainty``.

    The forecaster is the standard histogram calibrator: for each
    value of ``bin_col`` the forecast f_k is the TRAIN positive rate
    (test bins with no train rows fall back to the global train rate).
    Because forecasts are constant within bins, the decomposition is
    exact, not approximate:

      reliability = sum_k n_k (f_k - obar_k)^2 / N
      resolution  = sum_k n_k (obar_k - obar)^2 / N
      uncertainty = obar (1 - obar)

    with obar_k the test positive rate in bin k. Everything reduces to
    per-bin integer counts (two groupBys on the bin key) joined
    through one broadcast of the tiny bin table — no per-row state, no
    sort. Output: one row (n_test, brier, reliability, resolution,
    uncertainty).
    """
    y = F.col(label_col).cast("int")
    tr = train.groupBy(bin_col).agg(
        F.count(F.lit(1)).alias("n_tr"), F.sum(y).alias("pos_tr")
    )
    tr_tot = train.agg(
        (F.sum(y).cast("double") / F.count(F.lit(1))).alias("f_glob")
    )
    te = test.groupBy(bin_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum(y).cast("long").alias("pos_k"),
    )
    bins = (
        te.join(F.broadcast(tr), bin_col, "left")
        .crossJoin(F.broadcast(tr_tot))
        .select(
            "n_k",
            "pos_k",
            F.coalesce(
                F.col("pos_tr").cast("double") / F.col("n_tr"), F.col("f_glob")
            ).alias("f_k"),
        )
    )
    obar_k = F.col("pos_k") / F.col("n_k")
    agg = bins.agg(
        F.sum("n_k").cast("long").alias("n_test"),
        F.sum("pos_k").cast("long").alias("pos_test"),
        F.sum(F.col("n_k") * F.pow(F.col("f_k") - obar_k, 2)).alias("rel_num"),
        F.sum(F.col("n_k") * obar_k).alias("po_num"),
        F.sum(F.col("n_k") * obar_k * obar_k).alias("poo_num"),
    )
    obar = F.col("pos_test") / F.col("n_test")
    # sum n_k (obar_k - obar)^2 = sum n_k obar_k^2 - N obar^2
    resolution = (F.col("poo_num") - F.col("n_test") * obar * obar) / F.col("n_test")
    reliability = F.col("rel_num") / F.col("n_test")
    uncertainty = obar * (1.0 - obar)
    return agg.select(
        "n_test",
        F.round(reliability - resolution + uncertainty, round_to).alias("brier"),
        F.round(reliability, round_to).alias("reliability"),
        F.round(resolution, round_to).alias("resolution"),
        F.round(uncertainty, round_to).alias("uncertainty"),
    )


def brier_decomposition_sql(
    train_sql: str,
    test_sql: str,
    bin_col: str,
    label_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`brier_decomposition`. ``train_sql`` /
    ``test_sql`` are subqueries producing (bin_col, label_col)."""
    return f"""
    WITH tr AS (
      SELECT {bin_col} AS b, COUNT(*) AS n_tr,
             SUM(CAST({label_col} AS INTEGER)) AS pos_tr
      FROM ({train_sql}) GROUP BY 1
    ),
    trt AS (
      SELECT CAST(SUM(CAST({label_col} AS INTEGER)) AS DOUBLE) / COUNT(*)
               AS f_glob
      FROM ({train_sql})
    ),
    te AS (
      SELECT {bin_col} AS b, CAST(COUNT(*) AS BIGINT) AS n_k,
             CAST(SUM(CAST({label_col} AS INTEGER)) AS BIGINT) AS pos_k
      FROM ({test_sql}) GROUP BY 1
    ),
    bins AS (
      SELECT te.n_k, te.pos_k,
             COALESCE(CAST(tr.pos_tr AS DOUBLE) / tr.n_tr, trt.f_glob) AS f_k
      FROM te LEFT JOIN tr ON tr.b = te.b CROSS JOIN trt
    ),
    agg AS (
      SELECT CAST(SUM(n_k) AS BIGINT) AS n_test,
             CAST(SUM(pos_k) AS BIGINT) AS pos_test,
             SUM(n_k * POW(f_k - pos_k / CAST(n_k AS DOUBLE), 2)) AS rel_num,
             SUM(n_k * (pos_k / CAST(n_k AS DOUBLE))
                     * (pos_k / CAST(n_k AS DOUBLE))) AS poo_num
      FROM bins
    )
    SELECT n_test,
           ROUND(rel_num / n_test
                 - (poo_num - n_test * (pos_test / CAST(n_test AS DOUBLE))
                                     * (pos_test / CAST(n_test AS DOUBLE)))
                   / n_test
                 + (pos_test / CAST(n_test AS DOUBLE))
                   * (1.0 - pos_test / CAST(n_test AS DOUBLE)),
                 {round_to}) AS brier,
           ROUND(rel_num / n_test, {round_to}) AS reliability,
           ROUND((poo_num - n_test * (pos_test / CAST(n_test AS DOUBLE))
                                   * (pos_test / CAST(n_test AS DOUBLE)))
                 / n_test, {round_to}) AS resolution,
           ROUND((pos_test / CAST(n_test AS DOUBLE))
                 * (1.0 - pos_test / CAST(n_test AS DOUBLE)),
                 {round_to}) AS uncertainty
    FROM agg
    """


def levene_brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Brown-Forsythe variant of Levene's test: does the SPREAD (not
    the mean — that is :func:`anova_f`) differ across k groups? The
    statistic is the one-way ANOVA F computed on the absolute
    deviations from each group's MEDIAN, the robust form recommended
    over Levene's original mean-centered version for skewed data
    (Brown & Forsythe 1974).

    Determinism discipline (cross-engine exact until the final ratio):
    medians are never float-interpolated — the DOUBLED median
    ``med2 = x_(⌈(n+1)/2⌉) + x_(⌊(n+1)/2⌋)`` (sum of the one or two
    middle order statistics) is an exact 2-decimal DECIMAL, so the
    doubled deviations ``z2 = |2x - med2|`` are exact decimals too,
    and the F statistic is scale-invariant (F(z2) = F(z)). All
    moments accumulate as decimals; only the final SSB/SSW ratio runs
    in double.

    Scale shape: one ranked window per group to pick the two middle
    rows (partitioned by group — parallel across groups), a broadcast
    of the k-row median table back onto the scan, then the same
    map-side-combined moment aggregate as :func:`anova_f`.

    Output (one row): (k, n, median_min, median_max, w_stat).
    """
    x = F.col(value_col).cast("decimal(18,2)")
    ranked = df.select(F.col(group_col).alias("__g"), x.alias("__x")).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__g").orderBy("__x")),
    )
    sizes = ranked.groupBy("__g").agg(F.max("__rn").alias("__n"))
    med2 = (
        ranked.join(F.broadcast(sizes), "__g")
        .filter(
            (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
            | (F.col("__rn") == F.ceil((F.col("__n") + 1) / 2))
        )
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__mid_rows"),
            F.sum("__x").alias("__mid_sum"),
        )
        .select(
            "__g",
            F.when(
                F.col("__mid_rows") == 1, F.col("__mid_sum") * 2
            )
            .otherwise(F.col("__mid_sum"))
            .cast("decimal(18,2)")
            .alias("__med2"),
        )
    )
    z2 = (
        df.select(F.col(group_col).alias("__g"), x.alias("__x"))
        .join(F.broadcast(med2), "__g")
        .select(
            "__g",
            F.abs(F.col("__x") * 2 - F.col("__med2"))
            .cast("decimal(18,2)")
            .alias("__z2"),
        )
    )
    per = z2.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__z2").alias("__s"),
        F.sum(F.col("__z2") * F.col("__z2")).alias("__s2"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__n").alias("n"),
        F.sum("__s").cast("double").alias("__S"),
        F.sum(
            F.col("__s2").cast("double")
            - F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__n")
        ).alias("__ssw"),
        F.sum(
            F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__n")
        ).alias("__sb_raw"),
    )
    meds = med2.agg(
        (F.min("__med2") / 2).cast("double").alias("median_min"),
        (F.max("__med2") / 2).cast("double").alias("median_max"),
    )
    ssb = F.col("__sb_raw") - F.col("__S") * F.col("__S") / F.col("n")
    w_stat = (ssb / (F.col("k") - 1)) / (F.col("__ssw") / (F.col("n") - F.col("k")))
    return agg.crossJoin(F.broadcast(meds)).select(
        "k",
        "n",
        F.round("median_min", round_to).alias("median_min"),
        F.round("median_max", round_to).alias("median_max"),
        F.round(w_stat, round_to).alias("w_stat"),
    )


def levene_brown_forsythe_sql(
    table: str, group_col: str, value_col: str, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`levene_brown_forsythe` (same doubled-
    median + exact-decimal-moment construction)."""
    return f"""
    WITH ranked AS (
      SELECT {group_col} AS g,
             CAST({value_col} AS DECIMAL(18,2)) AS x,
             ROW_NUMBER() OVER (
               PARTITION BY {group_col}
               ORDER BY CAST({value_col} AS DECIMAL(18,2))
             ) AS rn
      FROM {table}
    ),
    sizes AS (SELECT g, MAX(rn) AS n FROM ranked GROUP BY g),
    med2 AS (
      SELECT r.g,
             CAST(CASE WHEN COUNT(*) = 1 THEN SUM(r.x) * 2
                       ELSE SUM(r.x) END AS DECIMAL(18,2)) AS med2
      FROM ranked r JOIN sizes s ON r.g = s.g
      WHERE r.rn = (s.n + 1) // 2 OR r.rn = (s.n + 2) // 2
      GROUP BY r.g
    ),
    z AS (
      SELECT r.g,
             CAST(ABS(r.x * 2 - m.med2) AS DECIMAL(18,2)) AS z2
      FROM (SELECT {group_col} AS g,
                   CAST({value_col} AS DECIMAL(18,2)) AS x
            FROM {table}) r
      JOIN med2 m ON r.g = m.g
    ),
    per AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(z2) AS s, SUM(z2 * z2) AS s2
      FROM z GROUP BY g
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(s) AS DOUBLE) AS S,
             SUM(CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
               AS ssw,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb_raw
      FROM per
    ),
    meds AS (
      SELECT CAST(MIN(med2) / 2 AS DOUBLE) AS median_min,
             CAST(MAX(med2) / 2 AS DOUBLE) AS median_max
      FROM med2
    )
    SELECT k, n,
           ROUND(median_min, {round_to}) AS median_min,
           ROUND(median_max, {round_to}) AS median_max,
           ROUND(((sb_raw - S * S / n) / (k - 1)) / (ssw / (n - k)),
                 {round_to}) AS w_stat
    FROM agg CROSS JOIN meds
    """


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test with the
    tie-corrected normal approximation — the distribution-free
    complement to :func:`welch_ttest` (which assumes normal-ish
    means), and the 2-sample special case of `kruskal_wallis`.

    Rank-space trick for exactness (same as `spearman_corr`): doubled
    average ranks are INTEGERS — for a value with ``c_prev`` combined
    observations strictly below it and ``c`` ties, the doubled rank is
    ``2*c_prev + c + 1``. Ranks are computed on the aggregated
    (value -> count) table, never per row, so the rank stage shuffles
    distinct values only; the per-row scan just aggregates counts.
    ``2*U_a = 2*R_a - n_a*(n_a+1)`` stays integer; the tie term
    ``sum(t^3 - t)`` is an integer sum over the same value-count
    table. Only the final z ratio runs in double.

    Output (one row):
    (n_a, n_b, u2_a BIGINT = 2*U_a, u_a DOUBLE, z DOUBLE).
    """
    x = F.col(value_col).cast("decimal(18,2)")
    two = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"), x.alias("__x")
    )
    counts = two.groupBy("__x").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("__ca"),
    )
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.withColumn(
        "__cprev", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).withColumn("__dr", 2 * F.col("__cprev") + F.col("__c") + 1)
    agg = ranked.agg(
        F.sum("__ca").alias("n_a"),
        F.sum(F.col("__c") - F.col("__ca")).alias("n_b"),
        F.sum(F.col("__ca") * F.col("__dr")).alias("__r2a"),
        F.sum(
            F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c")
        ).alias("__ties"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u2 = F.col("__r2a") - n_a * (n_a + 1)
    mu2 = (n_a * n_b).cast("double")  # 2 * n_a*n_b/2
    var = (n_a * n_b).cast("double") / 12.0 * (
        (n + 1).cast("double")
        - F.col("__ties").cast("double") / (n * (n - 1)).cast("double")
    )
    z = (u2.cast("double") - mu2) / (2.0 * F.sqrt(var))
    return agg.select(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        u2.cast("bigint").alias("u2_a"),
        (u2.cast("double") / 2.0).alias("u_a"),
        F.round(z, round_to).alias("z"),
    )


def mann_whitney_u_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`mann_whitney_u`."""
    return f"""
    WITH two AS (
      SELECT {group_col} AS g, CAST({value_col} AS DECIMAL(18,2)) AS x
      FROM {table}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
    ),
    counts AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END) AS BIGINT)
               AS ca
      FROM two GROUP BY x
    ),
    ranked AS (
      SELECT c, ca,
             COALESCE(SUM(c) OVER (
               ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cprev
      FROM counts
    ),
    agg AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(c - ca) AS BIGINT) AS n_b,
             CAST(SUM(ca * (2 * cprev + c + 1)) AS BIGINT) AS r2a,
             CAST(SUM(c * c * c - c) AS BIGINT) AS ties
      FROM ranked
    )
    SELECT n_a, n_b,
           CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
           ROUND(
             (CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
              - CAST(n_a * n_b AS DOUBLE))
             / (2.0 * SQRT(CAST(n_a * n_b AS DOUBLE) / 12.0
                 * (CAST(n_a + n_b + 1 AS DOUBLE)
                    - CAST(ties AS DOUBLE)
                      / CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)))),
             {round_to}) AS z
    FROM agg
    """


def wilcoxon_signed_rank(
    paired: DataFrame,
    diff_col: str = "d",
    round_to: int = 6,
) -> DataFrame:
    """Wilcoxon signed-rank test over a paired-difference column (the
    paired complement to :func:`mann_whitney_u`'s independent-samples
    rank-sum): drop zero differences, rank |d| with average ranks,
    and compare W+ (rank sum of positive differences) against its
    null mean with the tie-corrected normal approximation

      ``z = (W+ - n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 - sum(t^3-t)/48)``.

    ``diff_col`` must be integer-valued (e.g. a difference of counts)
    so |d| ranks aggregate exactly. Doubled average ranks are INTEGERS
    computed on the |d| -> count table (same trick as
    `mann_whitney_u`), so 2*W+ and the tie term stay integer all the
    way to the final z ratio.

    Output (one row): (n_nonzero, w2_plus BIGINT = 2*W+, w_plus,
    z).
    """
    nz = paired.filter(F.col(diff_col) != 0).select(
        F.abs(F.col(diff_col)).cast("bigint").alias("__ad"),
        (F.col(diff_col) > 0).alias("__pos"),
    )
    counts = nz.groupBy("__ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum(F.when(F.col("__pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("__cp"),
    )
    w = Window.orderBy("__ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.withColumn(
        "__cprev", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).withColumn("__dr", 2 * F.col("__cprev") + F.col("__c") + 1)
    agg = ranked.agg(
        F.sum("__c").alias("n"),
        F.sum(F.col("__cp") * F.col("__dr")).alias("__w2p"),
        F.sum(
            F.col("__c") * F.col("__c") * F.col("__c") - F.col("__c")
        ).alias("__ties"),
    )
    n = F.col("n")
    mu2 = (n * (n + 1)).cast("double") / 2.0  # 2 * n(n+1)/4
    var = (n * (n + 1) * (2 * n + 1)).cast("double") / 24.0 - F.col(
        "__ties"
    ).cast("double") / 48.0
    z = (F.col("__w2p").cast("double") - mu2) / (2.0 * F.sqrt(var))
    return agg.select(
        n.cast("bigint").alias("n_nonzero"),
        F.col("__w2p").cast("bigint").alias("w2_plus"),
        (F.col("__w2p").cast("double") / 2.0).alias("w_plus"),
        F.round(z, round_to).alias("z"),
    )


def wilcoxon_signed_rank_sql(
    paired_sql: str, diff_col: str = "d", round_to: int = 6
) -> str:
    """DuckDB twin of :func:`wilcoxon_signed_rank`; ``paired_sql``
    yields the paired-difference table."""
    return f"""
    WITH paired AS ({paired_sql}),
    nz AS (
      SELECT CAST(ABS({diff_col}) AS BIGINT) AS ad,
             {diff_col} > 0 AS pos
      FROM paired WHERE {diff_col} <> 0
    ),
    counts AS (
      SELECT ad, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp
      FROM nz GROUP BY ad
    ),
    ranked AS (
      SELECT c, cp,
             COALESCE(SUM(c) OVER (
               ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cprev
      FROM counts
    ),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(cp * (2 * cprev + c + 1)) AS BIGINT) AS w2p,
             CAST(SUM(c * c * c - c) AS BIGINT) AS ties
      FROM ranked
    )
    SELECT n AS n_nonzero,
           w2p AS w2_plus,
           CAST(w2p AS DOUBLE) / 2.0 AS w_plus,
           ROUND(
             (CAST(w2p AS DOUBLE) - CAST(n * (n + 1) AS DOUBLE) / 2.0)
             / (2.0 * SQRT(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24.0
                           - CAST(ties AS DOUBLE) / 48.0)),
             {round_to}) AS z
    FROM agg
    """


def friedman_test(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Friedman rank test for k treatments over n blocks (the
    nonparametric repeated-measures ANOVA; Friedman 1937): rank the k
    treatment values WITHIN each block (average ranks on ties), sum
    ranks per treatment, and

      ``Q = 12/(n k (k+1)) * sum_j R_j^2 - 3 n (k+1)``.

    Only COMPLETE blocks (all k treatments present) enter, filtered
    identically in both engines. Doubled within-block average ranks
    are exact integers: ``dr = 2*rank_min + (ties - 1)`` from the
    block-partitioned RANK() window plus the per-(block, value) tie
    count — so rank sums accumulate exactly and only the final Q
    arithmetic runs in double (sum R_j^2 is exact at .25 grain).

    Scale shape: blocks are the window partition key — thousands of
    small windows, fully parallel; rank sums shuffle k rows.

    Output (one row): (n_blocks, k, q_stat).
    """
    k_total = df.select(treatment_col).distinct().count()
    complete = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("__nb"))
        .filter(F.col("__nb") == k_total)
        .select(block_col)
    )
    rows = df.join(complete, block_col)
    w_rank = Window.partitionBy(block_col).orderBy(value_col)
    w_tie = Window.partitionBy(block_col, value_col)
    ranked = rows.select(
        F.col(treatment_col).alias("__tr"),
        (
            2 * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        ).alias("__dr"),
    )
    per_tr = ranked.groupBy("__tr").agg(
        F.sum("__dr").cast("bigint").alias("__r2")
    )
    agg = per_tr.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.col("__r2").cast("double") * F.col("__r2") / 4.0
        ).alias("__sumr2"),
    )
    n_blocks = complete.count()
    n, k = F.lit(n_blocks).cast("bigint"), F.col("k")
    q = (
        12.0 / (n * k * (k + 1)).cast("double") * F.col("__sumr2")
        - 3.0 * (n * (k + 1)).cast("double")
    )
    return agg.select(
        n.alias("n_blocks"),
        k.alias("k"),
        F.round(q, round_to).alias("q_stat"),
    )


def friedman_test_sql(
    table_sql: str,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`friedman_test`; ``table_sql`` yields the
    (block, treatment, value) table."""
    return f"""
    WITH t AS ({table_sql}),
    kt AS (SELECT CAST(COUNT(DISTINCT {treatment_col}) AS BIGINT) AS k
           FROM t),
    complete AS (
      SELECT {block_col} FROM t CROSS JOIN kt
      GROUP BY {block_col}, kt.k HAVING COUNT(*) = kt.k
    ),
    rows_c AS (SELECT t.* FROM t JOIN complete USING ({block_col})),
    ranked AS (
      SELECT {treatment_col} AS tr,
             2 * RANK() OVER (
               PARTITION BY {block_col} ORDER BY {value_col})
             + COUNT(*) OVER (
               PARTITION BY {block_col}, {value_col})
             - 1 AS dr
      FROM rows_c
    ),
    per_tr AS (
      SELECT tr, CAST(SUM(dr) AS BIGINT) AS r2 FROM ranked GROUP BY tr
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(r2 AS DOUBLE) * r2 / 4.0) AS sumr2
      FROM per_tr
    ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM complete)
    SELECT nb.n AS n_blocks, agg.k,
           ROUND(12.0 / CAST(nb.n * agg.k * (agg.k + 1) AS DOUBLE)
                   * agg.sumr2
                 - 3.0 * CAST(nb.n * (agg.k + 1) AS DOUBLE),
                 {round_to}) AS q_stat
    FROM agg CROSS JOIN nb
    """


def mahalanobis_outliers_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    threshold: float = 13.8155,
    round_to: int = 6,
) -> DataFrame:
    """Bivariate Mahalanobis-distance outlier audit — the MULTIVARIATE
    step up from the per-column robust family (`robust_outliers_iqr`,
    MAD, z-score): a point can be unremarkable on each margin yet far
    from the joint distribution, and d² sees exactly that through the
    correlation term:

      ``d² = (zx² - 2·rho·zx·zy + zy²) / (1 - rho²)``.

    Under bivariate normality d² ~ chi²(2); the default threshold is
    the 0.999 quantile (13.8155).

    Determinism discipline: all six sufficient moments accumulate as
    EXACT decimals (2-decimal inputs), so means/variances/rho are
    bit-identical doubles in both engines and every per-row d² is
    bit-identical too — the outlier COUNT is exact, not tolerance-
    matched. Two scans (moments, then score) with the 1-row moment
    table broadcast into the second; nothing else shuffles.

    Output (one row): (n, n_outliers, mean_d2, max_d2).
    """
    x = F.col(x_col).cast("decimal(18,2)")
    y = F.col(y_col).cast("decimal(18,2)")
    m = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    nn = F.col("__n").cast("double")
    mx = F.col("__sx").cast("double") / nn
    my = F.col("__sy").cast("double") / nn
    vx = (F.col("__sxx").cast("double") - F.col("__sx").cast("double") * F.col("__sx").cast("double") / nn) / (nn - 1)
    vy = (F.col("__syy").cast("double") - F.col("__sy").cast("double") * F.col("__sy").cast("double") / nn) / (nn - 1)
    cxy = (F.col("__sxy").cast("double") - F.col("__sx").cast("double") * F.col("__sy").cast("double") / nn) / (nn - 1)
    stats = m.select(
        F.col("__n"),
        mx.alias("__mx"),
        my.alias("__my"),
        vx.alias("__vx"),
        vy.alias("__vy"),
        (cxy / F.sqrt(vx * vy)).alias("__rho"),
    )
    zx = (x.cast("double") - F.col("__mx")) / F.sqrt(F.col("__vx"))
    zy = (y.cast("double") - F.col("__my")) / F.sqrt(F.col("__vy"))
    d2 = (
        zx * zx - 2.0 * F.col("__rho") * zx * zy + zy * zy
    ) / (1.0 - F.col("__rho") * F.col("__rho"))
    scored = df.crossJoin(F.broadcast(stats)).select(
        F.col("__n"), d2.alias("__d2")
    )
    return scored.groupBy("__n").agg(
        F.sum((F.col("__d2") > F.lit(float(threshold))).cast("long"))
        .cast("bigint")
        .alias("n_outliers"),
        F.round(F.avg("__d2"), round_to).alias("mean_d2"),
        F.round(F.max("__d2"), round_to).alias("max_d2"),
    ).select(
        F.col("__n").alias("n"), "n_outliers", "mean_d2", "max_d2"
    )


def mahalanobis_outliers_2d_sql(
    table: str,
    x_col: str,
    y_col: str,
    threshold: float = 13.8155,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`mahalanobis_outliers_2d`."""
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST({x_col} AS DECIMAL(18,2))) AS sx,
             SUM(CAST({y_col} AS DECIMAL(18,2))) AS sy,
             SUM(CAST({x_col} AS DECIMAL(18,2))
                 * CAST({x_col} AS DECIMAL(18,2))) AS sxx,
             SUM(CAST({y_col} AS DECIMAL(18,2))
                 * CAST({y_col} AS DECIMAL(18,2))) AS syy,
             SUM(CAST({x_col} AS DECIMAL(18,2))
                 * CAST({y_col} AS DECIMAL(18,2))) AS sxy
      FROM {table}
    ),
    stats AS (
      SELECT n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS vx,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS vy,
             ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
             / SQRT(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                      * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1))
                    * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1))) AS rho
      FROM m
    ),
    scored AS (
      SELECT stats.n,
             ((CAST(CAST({x_col} AS DECIMAL(18,2)) AS DOUBLE) - mx)
                / SQRT(vx)
              * ((CAST(CAST({x_col} AS DECIMAL(18,2)) AS DOUBLE) - mx)
                 / SQRT(vx))
              - 2.0 * rho
                * ((CAST(CAST({x_col} AS DECIMAL(18,2)) AS DOUBLE) - mx)
                   / SQRT(vx))
                * ((CAST(CAST({y_col} AS DECIMAL(18,2)) AS DOUBLE) - my)
                   / SQRT(vy))
              + ((CAST(CAST({y_col} AS DECIMAL(18,2)) AS DOUBLE) - my)
                 / SQRT(vy))
                * ((CAST(CAST({y_col} AS DECIMAL(18,2)) AS DOUBLE) - my)
                   / SQRT(vy)))
             / (1.0 - rho * rho) AS d2
      FROM {table} CROSS JOIN stats
    )
    SELECT n,
           CAST(SUM(CASE WHEN d2 > {threshold!r} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           ROUND(AVG(d2), {round_to}) AS mean_d2,
           ROUND(MAX(d2), {round_to}) AS max_d2
    FROM scored GROUP BY n
    """


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-order partial correlation r(x,y | z) — how much of the
    x~y association survives after controlling for z:

      ``r_xy.z = (r_xy - r_xz * r_yz)
                 / sqrt((1 - r_xz²) * (1 - r_yz²))``.

    The inference step `correlation_matrix` stops short of: a strong
    marginal correlation driven entirely by a confounder z zeroes out
    here. All nine sufficient moments accumulate as EXACT decimals in
    ONE map-side-combined aggregate (the corpus is scanned once);
    every r and the final partial run in double on bit-identical
    inputs.

    Output (one row): (n, r_xy, r_xz, r_yz, r_xy_given_z).
    """
    x = F.col(x_col).cast("decimal(18,2)")
    y = F.col(y_col).cast("decimal(18,2)")
    z = F.col(z_col).cast("decimal(18,2)")
    m = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(x).alias("__sx"), F.sum(y).alias("__sy"), F.sum(z).alias("__sz"),
        F.sum(x * x).alias("__sxx"), F.sum(y * y).alias("__syy"),
        F.sum(z * z).alias("__szz"),
        F.sum(x * y).alias("__sxy"), F.sum(x * z).alias("__sxz"),
        F.sum(y * z).alias("__syz"),
    )
    nn = F.col("__n").cast("double")

    def _r(sab, sa, sb, saa, sbb):
        num = F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(sb).cast("double") / nn
        da = F.col(saa).cast("double") - F.col(sa).cast("double") * F.col(sa).cast("double") / nn
        db = F.col(sbb).cast("double") - F.col(sb).cast("double") * F.col(sb).cast("double") / nn
        return num / F.sqrt(da * db)

    rxy = _r("__sxy", "__sx", "__sy", "__sxx", "__syy")
    rxz = _r("__sxz", "__sx", "__sz", "__sxx", "__szz")
    ryz = _r("__syz", "__sy", "__sz", "__syy", "__szz")
    partial = (rxy - rxz * ryz) / F.sqrt(
        (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    )
    return m.select(
        F.col("__n").alias("n"),
        F.round(rxy, round_to).alias("r_xy"),
        F.round(rxz, round_to).alias("r_xz"),
        F.round(ryz, round_to).alias("r_yz"),
        F.round(partial, round_to).alias("r_xy_given_z"),
    )


def partial_correlation_sql(
    table: str,
    x_col: str,
    y_col: str,
    z_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`partial_correlation`."""
    dx, dy, dz = (
        f"CAST({x_col} AS DECIMAL(18,2))",
        f"CAST({y_col} AS DECIMAL(18,2))",
        f"CAST({z_col} AS DECIMAL(18,2))",
    )
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM({dx}) AS sx, SUM({dy}) AS sy, SUM({dz}) AS sz,
             SUM({dx} * {dx}) AS sxx, SUM({dy} * {dy}) AS syy,
             SUM({dz} * {dz}) AS szz,
             SUM({dx} * {dy}) AS sxy, SUM({dx} * {dz}) AS sxz,
             SUM({dy} * {dz}) AS syz
      FROM {table}
    ),
    r AS (
      SELECT n,
        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
           / CAST(n AS DOUBLE))
        / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))) AS rxy,
        (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)
           / CAST(n AS DOUBLE))
        / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                  / CAST(n AS DOUBLE))) AS rxz,
        (CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE)
           / CAST(n AS DOUBLE))
        / SQRT((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                  / CAST(n AS DOUBLE))) AS ryz
      FROM m
    )
    SELECT n,
           ROUND(rxy, {round_to}) AS r_xy,
           ROUND(rxz, {round_to}) AS r_xz,
           ROUND(ryz, {round_to}) AS r_yz,
           ROUND((rxy - rxz * ryz)
                 / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)),
                 {round_to}) AS r_xy_given_z
    FROM r
    """


def effect_sizes(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Standardized effect sizes for a two-group mean difference —
    the MAGNITUDE report that significance tests (`welch_ttest`,
    `mann_whitney_u`) deliberately do not give:

    - Cohen's d (pooled-SD standardized difference),
    - Hedges' g (d times the small-sample bias correction
      ``1 - 3/(4(n_a+n_b) - 9)``),
    - Glass's delta (control-SD standardized, group_b as control).

    Moments accumulate as exact decimals (one map-side-combined
    aggregate, corpus scanned once); all ratios run in double on
    bit-identical inputs.

    Output (one row): (n_a, n_b, mean_diff, cohen_d, hedges_g,
    glass_delta).
    """
    x = F.col(value_col).cast("decimal(18,2)")
    g = F.col(group_col)
    two = df.filter(g.isin([group_a, group_b]))
    m = two.agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).cast("bigint").alias("__na"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).cast("bigint").alias("__nb"),
        F.sum(F.when(g == group_a, x)).alias("__sa"),
        F.sum(F.when(g == group_b, x)).alias("__sb"),
        F.sum(F.when(g == group_a, x * x)).alias("__sa2"),
        F.sum(F.when(g == group_b, x * x)).alias("__sb2"),
    )
    na, nb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    ma = F.col("__sa").cast("double") / na
    mb = F.col("__sb").cast("double") / nb
    va = (F.col("__sa2").cast("double") - F.col("__sa").cast("double") * F.col("__sa").cast("double") / na) / (na - 1.0)
    vb = (F.col("__sb2").cast("double") - F.col("__sb").cast("double") * F.col("__sb").cast("double") / nb) / (nb - 1.0)
    sp = F.sqrt(((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0))
    d = (ma - mb) / sp
    corr = 1.0 - 3.0 / (4.0 * (na + nb) - 9.0)
    return m.select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.round(ma - mb, round_to).alias("mean_diff"),
        F.round(d, round_to).alias("cohen_d"),
        F.round(d * corr, round_to).alias("hedges_g"),
        F.round((ma - mb) / F.sqrt(vb), round_to).alias("glass_delta"),
    )


def effect_sizes_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`effect_sizes`."""
    x = f"CAST({value_col} AS DECIMAL(18,2))"
    return f"""
    WITH m AS (
      SELECT
        CAST(SUM(CASE WHEN {group_col} = '{group_a}' THEN 1 ELSE 0 END)
             AS BIGINT) AS na,
        CAST(SUM(CASE WHEN {group_col} = '{group_b}' THEN 1 ELSE 0 END)
             AS BIGINT) AS nb,
        SUM(CASE WHEN {group_col} = '{group_a}' THEN {x} END) AS sa,
        SUM(CASE WHEN {group_col} = '{group_b}' THEN {x} END) AS sb,
        SUM(CASE WHEN {group_col} = '{group_a}' THEN {x} * {x} END) AS sa2,
        SUM(CASE WHEN {group_col} = '{group_b}' THEN {x} * {x} END) AS sb2
      FROM {table}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
    ),
    s AS (
      SELECT na, nb,
             CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
             CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
             (CAST(sa2 AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) AS va,
             (CAST(sb2 AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0) AS vb
      FROM m
    )
    SELECT na AS n_a, nb AS n_b,
           ROUND(ma - mb, {round_to}) AS mean_diff,
           ROUND((ma - mb)
                 / SQRT(((CAST(na AS DOUBLE) - 1.0) * va
                         + (CAST(nb AS DOUBLE) - 1.0) * vb)
                        / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)),
                 {round_to}) AS cohen_d,
           ROUND((ma - mb)
                 / SQRT(((CAST(na AS DOUBLE) - 1.0) * va
                         + (CAST(nb AS DOUBLE) - 1.0) * vb)
                        / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0))
                 * (1.0 - 3.0 / (4.0 * (CAST(na AS DOUBLE)
                                        + CAST(nb AS DOUBLE)) - 9.0)),
                 {round_to}) AS hedges_g,
           ROUND((ma - mb) / SQRT(vb), {round_to}) AS glass_delta
    FROM s
    """


def cramers_v(
    df: DataFrame,
    row_col: str,
    col_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cramér's V with the Bergsma bias correction — the EFFECT-SIZE
    companion to the chi-square independence test (chi2 says "is
    there association", V says "how much", on [0,1] regardless of
    table shape):

      ``V = sqrt(chi2/n / min(r-1, c-1))``, and the corrected form
      replaces ``chi2/n`` with ``max(0, chi2/n - (r-1)(c-1)/(n-1))``
      and shrinks r, c the same way (Bergsma 2013).

    Scale shape: identical to `chi_square_source_lang` — ONE corpus
    aggregation to the contingency table; marginals, expecteds and
    the zero-cell-complete grid all derive from that tiny table.

    Output (one row): (n, r, c, chi2, v, v_corrected).
    """
    obs = (
        df.groupBy(row_col, col_col)
        .agg(F.count(F.lit(1)).alias("__o"))
        .localCheckpoint(eager=False)
    )
    row_tot = obs.groupBy(row_col).agg(F.sum("__o").alias("__r"))
    col_tot = obs.groupBy(col_col).agg(F.sum("__o").alias("__c"))
    tot = obs.agg(F.sum("__o").cast("bigint").alias("__n"))
    grid = (
        row_tot.crossJoin(col_tot)
        .join(obs, [row_col, col_col], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce(F.col("__o"), F.lit(0)).alias("__o"),
            (
                F.col("__r").cast("double")
                * F.col("__c")
                / F.col("__n")
            ).alias("__e"),
            "__n",
        )
    )
    chi2 = grid.groupBy("__n").agg(
        F.sum(
            (F.col("__o") - F.col("__e"))
            * (F.col("__o") - F.col("__e"))
            / F.col("__e")
        ).alias("__chi2")
    )
    dims = row_tot.agg(F.count(F.lit(1)).cast("bigint").alias("__rr")).crossJoin(
        col_tot.agg(F.count(F.lit(1)).cast("bigint").alias("__cc"))
    )
    j = chi2.crossJoin(F.broadcast(dims))
    nn = F.col("__n").cast("double")
    rr, cc = F.col("__rr").cast("double"), F.col("__cc").cast("double")
    phi2 = F.col("__chi2") / nn
    v = F.sqrt(phi2 / F.least(rr - 1.0, cc - 1.0))
    phi2c = F.greatest(
        phi2 - (rr - 1.0) * (cc - 1.0) / (nn - 1.0), F.lit(0.0)
    )
    rc = rr - (rr - 1.0) * (rr - 1.0) / (nn - 1.0)
    cc2 = cc - (cc - 1.0) * (cc - 1.0) / (nn - 1.0)
    vc = F.sqrt(phi2c / F.least(rc - 1.0, cc2 - 1.0))
    return j.select(
        F.col("__n").alias("n"),
        F.col("__rr").alias("r"),
        F.col("__cc").alias("c"),
        F.round("__chi2", round_to).alias("chi2"),
        F.round(v, round_to).alias("v"),
        F.round(vc, round_to).alias("v_corrected"),
    )


def cramers_v_sql(
    table: str,
    row_col: str,
    col_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cramers_v`."""
    return f"""
    WITH obs AS (
      SELECT {row_col} AS rk, {col_col} AS ck,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM {table} GROUP BY 1, 2
    ),
    row_tot AS (SELECT rk, SUM(o) AS r FROM obs GROUP BY 1),
    col_tot AS (SELECT ck, SUM(o) AS c FROM obs GROUP BY 1),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    grid AS (
      SELECT COALESCE(obs.o, 0) AS o,
             CAST(rt.r AS DOUBLE) * ct.c / t.n AS e,
             t.n
      FROM row_tot rt CROSS JOIN col_tot ct CROSS JOIN tot t
      LEFT JOIN obs ON obs.rk = rt.rk AND obs.ck = ct.ck
    ),
    x AS (
      SELECT n, SUM((o - e) * (o - e) / e) AS chi2 FROM grid GROUP BY n
    ),
    dims AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM row_tot) AS rr,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM col_tot) AS cc
    )
    SELECT x.n, dims.rr AS r, dims.cc AS c,
           ROUND(x.chi2, {round_to}) AS chi2,
           ROUND(SQRT((x.chi2 / CAST(x.n AS DOUBLE))
                 / LEAST(CAST(dims.rr AS DOUBLE) - 1.0,
                         CAST(dims.cc AS DOUBLE) - 1.0)),
                 {round_to}) AS v,
           ROUND(SQRT(GREATEST(x.chi2 / CAST(x.n AS DOUBLE)
                       - (CAST(dims.rr AS DOUBLE) - 1.0)
                         * (CAST(dims.cc AS DOUBLE) - 1.0)
                         / (CAST(x.n AS DOUBLE) - 1.0), 0.0)
                 / LEAST((CAST(dims.rr AS DOUBLE)
                          - (CAST(dims.rr AS DOUBLE) - 1.0)
                            * (CAST(dims.rr AS DOUBLE) - 1.0)
                            / (CAST(x.n AS DOUBLE) - 1.0)) - 1.0,
                         (CAST(dims.cc AS DOUBLE)
                          - (CAST(dims.cc AS DOUBLE) - 1.0)
                            * (CAST(dims.cc AS DOUBLE) - 1.0)
                            / (CAST(x.n AS DOUBLE) - 1.0)) - 1.0)),
                 {round_to}) AS v_corrected
    FROM x CROSS JOIN dims
    """


def theils_u(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Theil's uncertainty coefficient U(x|y) and U(y|x) — the
    ASYMMETRIC categorical-association measure (how much knowing y
    reduces uncertainty about x, as a fraction of H(x)); Cramér's V
    is symmetric and can hide one-directional dependence:

      ``U(x|y) = (H(x) - H(x|y)) / H(x) = I(x;y) / H(x)``.

    Everything derives from the one contingency aggregation: H(x),
    H(y) from the marginals, the mutual information from the joint —
    all natural-log arithmetic over the tiny table.

    Output (one row): (n, h_x, h_y, mutual_info, u_x_given_y,
    u_y_given_x).
    """
    obs = (
        df.groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
        .localCheckpoint(eager=False)
    )
    tot = obs.agg(F.sum("__o").cast("double").alias("__n"))
    xm = obs.groupBy(x_col).agg(F.sum("__o").alias("__rx"))
    ym = obs.groupBy(y_col).agg(F.sum("__o").alias("__ry"))
    hx = xm.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            (F.col("__rx") / F.col("__n"))
            * F.log(F.col("__rx") / F.col("__n"))
        )).alias("__hx")
    )
    hy = ym.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            (F.col("__ry") / F.col("__n"))
            * F.log(F.col("__ry") / F.col("__n"))
        )).alias("__hy")
    )
    mi = (
        obs.join(F.broadcast(xm), x_col)
        .join(F.broadcast(ym), y_col)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("__o") / F.col("__n"))
                * F.log(
                    F.col("__o").cast("double")
                    * F.col("__n")
                    / (F.col("__rx").cast("double") * F.col("__ry"))
                )
            ).alias("__mi"),
            F.sum("__o").cast("bigint").alias("n"),
        )
    )
    j = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    return j.select(
        "n",
        F.round("__hx", round_to).alias("h_x"),
        F.round("__hy", round_to).alias("h_y"),
        F.round("__mi", round_to).alias("mutual_info"),
        F.round(F.col("__mi") / F.col("__hx"), round_to).alias("u_x_given_y"),
        F.round(F.col("__mi") / F.col("__hy"), round_to).alias("u_y_given_x"),
    )


def theils_u_sql(
    table: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`theils_u`."""
    return f"""
    WITH obs AS (
      SELECT {x_col} AS xk, {y_col} AS yk,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM {table} GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM obs),
    xm AS (SELECT xk, SUM(o) AS rx FROM obs GROUP BY 1),
    ym AS (SELECT yk, SUM(o) AS ry FROM obs GROUP BY 1),
    hx AS (
      SELECT -SUM((rx / n) * ln(rx / n)) AS hx FROM xm CROSS JOIN tot
    ),
    hy AS (
      SELECT -SUM((ry / n) * ln(ry / n)) AS hy FROM ym CROSS JOIN tot
    ),
    mi AS (
      SELECT SUM((o / n) * ln(CAST(o AS DOUBLE) * n
                              / (CAST(rx AS DOUBLE) * ry))) AS mi,
             CAST(SUM(o) AS BIGINT) AS n_rows
      FROM obs JOIN xm USING (xk) JOIN ym USING (yk) CROSS JOIN tot
    )
    SELECT mi.n_rows AS n,
           ROUND(hx.hx, {round_to}) AS h_x,
           ROUND(hy.hy, {round_to}) AS h_y,
           ROUND(mi.mi, {round_to}) AS mutual_info,
           ROUND(mi.mi / hx.hx, {round_to}) AS u_x_given_y,
           ROUND(mi.mi / hy.hy, {round_to}) AS u_y_given_x
    FROM mi CROSS JOIN hx CROSS JOIN hy
    """


def hellinger_binned(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    lo: float,
    hi: float,
    n_bins: int = 24,
    round_to: int = 6,
) -> DataFrame:
    """Hellinger distance between two groups' value distributions
    over a fixed equi-width histogram — the bounded-metric complement
    to `psi_source_drift` (PSI explodes on near-empty bins; Hellinger
    stays in [0,1] and is a true metric):

      ``BC = sum_i sqrt(p_i * q_i)``, ``H = sqrt(1 - BC)``.

    Bin assignment is the repo's explicit floor-divide histogram
    discipline; bin counts are exact integers from ONE corpus
    aggregation, so only the final sqrt arithmetic runs in double.

    Output (one row): (n_a, n_b, bhattacharyya, hellinger).
    """
    width = (hi - lo) / n_bins
    x = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(
            F.floor((x - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )
    g = F.col(group_col)
    two = df.filter(g.isin([group_a, group_b]))
    bins = two.groupBy(b.alias("__b")).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).cast("bigint").alias("__ca"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).cast("bigint").alias("__cb"),
    )
    tot = bins.agg(
        F.sum("__ca").cast("bigint").alias("__na"),
        F.sum("__cb").cast("bigint").alias("__nb"),
    )
    bc = bins.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.sqrt(
                (F.col("__ca").cast("double") / F.col("__na"))
                * (F.col("__cb").cast("double") / F.col("__nb"))
            )
        ).alias("__bc"),
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
    )
    return bc.select(
        "n_a",
        "n_b",
        F.round("__bc", round_to).alias("bhattacharyya"),
        F.round(F.sqrt(1.0 - F.col("__bc")), round_to).alias("hellinger"),
    )


def hellinger_binned_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    lo: float,
    hi: float,
    n_bins: int = 24,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`hellinger_binned`."""
    width = (hi - lo) / n_bins
    return f"""
    WITH bins AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((CAST({value_col} AS DOUBLE)
                                        - CAST({lo!r} AS DOUBLE))
                                       / CAST({width!r} AS DOUBLE))
                                 AS INTEGER), 0), {n_bins - 1}) AS b,
             CAST(SUM(CASE WHEN {group_col} = '{group_a}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN {group_col} = '{group_b}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM {table}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb
      FROM bins
    ),
    bc AS (
      SELECT SUM(SQRT((CAST(ca AS DOUBLE) / na)
                      * (CAST(cb AS DOUBLE) / nb))) AS bc,
             MAX(na) AS n_a, MAX(nb) AS n_b
      FROM bins CROSS JOIN tot
    )
    SELECT n_a, n_b,
           ROUND(bc, {round_to}) AS bhattacharyya,
           ROUND(SQRT(1.0 - bc), {round_to}) AS hellinger
    FROM bc
    """


def anderson_darling_2s(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Anderson-Darling test, tie-adjusted midrank version
    (Scholz & Stephens 1987, A²_akN) — the TAIL-SENSITIVE upgrade to
    `ks_test_sources`: KS sees only the single largest ECDF gap (and
    is blind in the tails where the ECDFs pinch); AD integrates the
    squared gap with 1/(F(1-F)) weighting, exactly where
    distribution drift in length/score columns hides.

      ``A² = (N-1)/N * sum_a (1/n_a) * sum_j (l_j/N)
             * (N*M_aj - n_a*B_j)² / (B_j(N-B_j) - N*l_j/4)``

    over distinct pooled values j (l_j ties at j; B_j, M_aj midrank
    cumulative counts). DOUBLED midrank counts are exact integers
    (same trick as `mann_whitney_u`), and multiplying each term's
    numerator and denominator by 4 keeps EVERY intermediate an exact
    bigint: ``(N*M2 - n_a*B2)² / (B2*(2N - B2) - N*l_j)`` with
    ``M2 = 2*M_aj``, ``B2 = 2*B_j`` — only the final weighted sum
    runs in double.

    Scale shape: one scan to (value -> per-group counts); prefix
    sums over the distinct-value table; a #distinct-row reduction.

    Output (one row): (n_a, n_b, n_values, a2).
    """
    v = F.col(value_col).cast("bigint")
    two = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    counts = two.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__l"),
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("__la"),
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    pre = counts.select(
        "__v",
        "__l",
        "__la",
        (F.col("__l") - F.col("__la")).alias("__lb"),
        F.coalesce(F.sum("__l").over(w), F.lit(0)).alias("__bprev"),
        F.coalesce(F.sum("__la").over(w), F.lit(0)).alias("__aprev"),
    ).select(
        "__v",
        "__l",
        "__la",
        "__lb",
        (2 * F.col("__bprev") + F.col("__l")).alias("__b2"),
        (2 * F.col("__aprev") + F.col("__la")).alias("__ma2"),
        (
            2 * (F.col("__bprev") - F.col("__aprev"))
            + F.col("__lb")
        ).alias("__mb2"),
    )
    tot = counts.agg(
        F.sum("__la").cast("bigint").alias("__na"),
        F.sum(F.col("__l") - F.col("__la")).cast("bigint").alias("__nb"),
        F.count(F.lit(1)).cast("bigint").alias("__nv"),
    )
    j = pre.crossJoin(F.broadcast(tot))
    nn = (F.col("__na") + F.col("__nb")).cast("double")
    big_n = F.col("__na") + F.col("__nb")

    def _term(m2, n_s):
        num = (big_n * m2 - n_s * F.col("__b2")).cast("double")
        den = (
            F.col("__b2") * (2 * big_n - F.col("__b2"))
            - big_n * F.col("__l")
        ).cast("double")
        return F.when(
            den > 0.0,
            (F.col("__l").cast("double") / nn) * num * num / den,
        ).otherwise(0.0)

    agg = j.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.max("__nv").alias("n_values"),
        F.sum(_term(F.col("__ma2"), F.col("__na"))).alias("__sa"),
        F.sum(_term(F.col("__mb2"), F.col("__nb"))).alias("__sb"),
    )
    nnn = (F.col("n_a") + F.col("n_b")).cast("double")
    a2 = ((nnn - 1.0) / nnn) * (
        F.col("__sa") / F.col("n_a") + F.col("__sb") / F.col("n_b")
    )
    return agg.select(
        "n_a", "n_b", "n_values", F.round(a2, round_to).alias("a2")
    )


def anderson_darling_2s_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`anderson_darling_2s`."""
    return f"""
    WITH two AS (
      SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS v
      FROM {table}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
    ),
    counts AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS l,
             CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END) AS BIGINT)
               AS la
      FROM two GROUP BY v
    ),
    pre AS (
      SELECT v, l, la, l - la AS lb,
             2 * COALESCE(SUM(l) OVER wp, 0) + l AS b2,
             2 * COALESCE(SUM(la) OVER wp, 0) + la AS ma2,
             2 * (COALESCE(SUM(l) OVER wp, 0)
                  - COALESCE(SUM(la) OVER wp, 0)) + (l - la) AS mb2
      FROM counts
      WINDOW wp AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING)
    ),
    tot AS (
      SELECT CAST(SUM(la) AS BIGINT) AS na,
             CAST(SUM(l - la) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS nv
      FROM counts
    ),
    terms AS (
      SELECT tot.na, tot.nb, tot.nv,
        CASE WHEN b2 * (2 * (na + nb) - b2) - (na + nb) * l > 0
             THEN (CAST(l AS DOUBLE) / CAST(na + nb AS DOUBLE))
                  * CAST((na + nb) * ma2 - na * b2 AS DOUBLE)
                  * CAST((na + nb) * ma2 - na * b2 AS DOUBLE)
                  / CAST(b2 * (2 * (na + nb) - b2) - (na + nb) * l
                         AS DOUBLE)
             ELSE 0.0 END AS ta,
        CASE WHEN b2 * (2 * (na + nb) - b2) - (na + nb) * l > 0
             THEN (CAST(l AS DOUBLE) / CAST(na + nb AS DOUBLE))
                  * CAST((na + nb) * mb2 - nb * b2 AS DOUBLE)
                  * CAST((na + nb) * mb2 - nb * b2 AS DOUBLE)
                  / CAST(b2 * (2 * (na + nb) - b2) - (na + nb) * l
                         AS DOUBLE)
             ELSE 0.0 END AS tb
      FROM pre CROSS JOIN tot
    ),
    agg AS (
      SELECT MAX(na) AS n_a, MAX(nb) AS n_b, MAX(nv) AS n_values,
             SUM(ta) AS sa, SUM(tb) AS sb
      FROM terms
    )
    SELECT n_a, n_b, n_values,
           ROUND(((CAST(n_a + n_b AS DOUBLE) - 1.0)
                  / CAST(n_a + n_b AS DOUBLE))
                 * (sa / n_a + sb / n_b), {round_to}) AS a2
    FROM agg
    """


def cochrans_q(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cochran's Q test — the k-treatment generalization of McNemar
    (`mcnemar_gates`) for BINARY outcomes over matched blocks: did
    the success rate differ across k treatments, given each block
    (user) was exposed to all of them?

      ``Q = k(k-1) * sum_j (C_j - T/k)² / (k*T - sum_i R_i²)``

    with C_j = per-treatment success counts, R_i = per-block success
    counts, T = total successes. Presence is the binary outcome here
    (did the block ever produce treatment j). EVERYTHING except the
    final ratio is exact integer arithmetic — C_j, R_i, T, and the
    squared sums; the j-sum is expanded as
    ``sum C_j² - T²/k`` scaled by k² to stay integer:
    ``Q = (k-1) * (k * sum C_j² - T²) / (k*T - sum R_i²)``.

    Scale shape: one corpus scan to the distinct (block, treatment)
    pair table; per-block and per-treatment rollups of that table;
    two tiny reductions.

    Output (one row): (n_blocks, k, q_stat).
    """
    pairs = df.select(
        F.col(block_col).alias("__b"), F.col(treatment_col).alias("__t")
    ).distinct()
    k_row = pairs.select("__t").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__k")
    )
    per_block = pairs.groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__r")
    )
    per_treat = pairs.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    blocks = per_block.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("__r").cast("bigint").alias("__tt"),
        F.sum(F.col("__r") * F.col("__r")).cast("bigint").alias("__r2"),
    )
    treats = per_treat.agg(
        F.sum(F.col("__c") * F.col("__c")).cast("bigint").alias("__c2")
    )
    j = blocks.crossJoin(F.broadcast(treats)).crossJoin(F.broadcast(k_row))
    k = F.col("__k")
    den = k * F.col("__tt") - F.col("__r2")
    q = F.when(
        den != 0,
        (k - 1).cast("double")
        * (k * F.col("__c2") - F.col("__tt") * F.col("__tt")).cast("double")
        / den.cast("double"),
    )  # NULL when every block hit all k treatments (zero variance)
    return j.select(
        "n_blocks",
        k.alias("k"),
        F.round(q, round_to).alias("q_stat"),
    )


def cochrans_q_sql(
    table: str,
    block_col: str,
    treatment_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cochrans_q`."""
    return f"""
    WITH pairs AS (
      SELECT DISTINCT {block_col} AS b, {treatment_col} AS t
      FROM {table}
    ),
    kk AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM pairs),
    per_block AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS r FROM pairs GROUP BY b
    ),
    per_treat AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY t
    ),
    blocks AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(r) AS BIGINT) AS tt,
             CAST(SUM(r * r) AS BIGINT) AS r2
      FROM per_block
    ),
    treats AS (SELECT CAST(SUM(c * c) AS BIGINT) AS c2 FROM per_treat)
    SELECT blocks.n_blocks, kk.k,
           ROUND(CASE WHEN kk.k * blocks.tt - blocks.r2 <> 0
                      THEN CAST(kk.k - 1 AS DOUBLE)
                           * CAST(kk.k * treats.c2
                                  - blocks.tt * blocks.tt AS DOUBLE)
                           / CAST(kk.k * blocks.tt - blocks.r2 AS DOUBLE)
                      ELSE NULL END,
                 {round_to}) AS q_stat
    FROM blocks CROSS JOIN treats CROSS JOIN kk
    """


def somers_d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Somers' D and Goodman-Kruskal gamma — ordinal-by-ordinal
    association from the contingency table (the ordered complement to
    Cramér's V, which ignores category ORDER): concordant/discordant
    pair counts

      ``gamma = (C - D) / (C + D)``,
      ``D_yx = (C - D) / (n(n-1)/2 - sum ties_x)``.

    Both ``x_col`` and ``y_col`` must be integer ordinal codes. C and
    D come from the contingency grid via prefix rectangles:
    ``C = sum_xy n_xy * N_above(x,y)`` where N_above is the count in
    cells strictly greater on both axes — computed with grid-level
    window sums over the TINY contingency table, so every
    intermediate is an exact bigint; the corpus is scanned once.

    Output (one row): (n, conc, disc, gamma, somers_d_yx).
    """
    obs = (
        df.groupBy(
            F.col(x_col).cast("bigint").alias("__x"),
            F.col(y_col).cast("bigint").alias("__y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
        .localCheckpoint(eager=False)
    )
    a = obs.select(
        F.col("__x").alias("x1"), F.col("__y").alias("y1"),
        F.col("__o").alias("o1"),
    )
    b = obs.select(
        F.col("__x").alias("x2"), F.col("__y").alias("y2"),
        F.col("__o").alias("o2"),
    )
    cross = a.crossJoin(b)
    conc = (
        cross.filter((F.col("x2") > F.col("x1")) & (F.col("y2") > F.col("y1")))
        .agg(
            F.coalesce(F.sum(F.col("o1") * F.col("o2")), F.lit(0))
            .cast("bigint")
            .alias("v")
        )
    )
    disc = (
        cross.filter((F.col("x2") > F.col("x1")) & (F.col("y2") < F.col("y1")))
        .agg(
            F.coalesce(F.sum(F.col("o1") * F.col("o2")), F.lit(0))
            .cast("bigint")
            .alias("v")
        )
    )
    tx = (
        obs.groupBy("__x").agg(F.sum("__o").alias("__cx"))
        .agg(
            F.sum(F.col("__cx") * (F.col("__cx") - 1) / 2)
            .cast("bigint")
            .alias("v")
        )
    )
    tot = obs.agg(F.sum("__o").cast("bigint").alias("n"))
    j = (
        tot.crossJoin(F.broadcast(conc.withColumnRenamed("v", "__conc")))
        .crossJoin(F.broadcast(disc.withColumnRenamed("v", "__disc")))
        .crossJoin(F.broadcast(tx.withColumnRenamed("v", "__tx")))
    )
    c, d = F.col("__conc").cast("double"), F.col("__disc").cast("double")
    npairs = (F.col("n") * (F.col("n") - 1) / 2).cast("bigint")
    return j.select(
        "n",
        F.col("__conc").alias("conc"),
        F.col("__disc").alias("disc"),
        F.round((c - d) / (c + d), round_to).alias("gamma"),
        F.round(
            (c - d) / (npairs - F.col("__tx")).cast("double"), round_to
        ).alias("somers_d_yx"),
    )


def somers_d_sql(
    table: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`somers_d`."""
    return f"""
    WITH obs AS (
      SELECT CAST({x_col} AS BIGINT) AS x, CAST({y_col} AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM {table} GROUP BY 1, 2
    ),
    conc AS (
      SELECT CAST(COALESCE(SUM(a.o * b.o), 0) AS BIGINT) AS v
      FROM obs a JOIN obs b ON b.x > a.x AND b.y > a.y
    ),
    disc AS (
      SELECT CAST(COALESCE(SUM(a.o * b.o), 0) AS BIGINT) AS v
      FROM obs a JOIN obs b ON b.x > a.x AND b.y < a.y
    ),
    tx AS (
      SELECT CAST(SUM(cx * (cx - 1) / 2) AS BIGINT) AS v
      FROM (SELECT SUM(o) AS cx FROM obs GROUP BY x)
    ),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
    SELECT tot.n,
           conc.v AS conc,
           disc.v AS disc,
           ROUND((CAST(conc.v AS DOUBLE) - disc.v)
                 / (CAST(conc.v AS DOUBLE) + disc.v), {round_to}) AS gamma,
           ROUND((CAST(conc.v AS DOUBLE) - disc.v)
                 / CAST(CAST(tot.n * (tot.n - 1) / 2 AS BIGINT) - tx.v
                        AS DOUBLE),
                 {round_to}) AS somers_d_yx
    FROM tot CROSS JOIN conc CROSS JOIN disc CROSS JOIN tx
    """


def kendalls_w(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kendall's coefficient of concordance W — "how consistently do
    the blocks rank the treatments" on [0,1] (the EFFECT SIZE whose
    significance test is `friedman_test`; W=1 means every day ranks
    the event types identically). Tie-corrected form:

      ``W = (12*sum R_j² - 3 n² k (k+1)²)
            / (n² k (k²-1) - n * sum_i T_i)``,

    with R_j the treatment rank sums and T_i = sum(t³-t) over tie
    groups within block i. DOUBLED within-block average ranks are
    exact integers (rank-window + tie-count, as in `friedman_test`),
    so ``sum (2R_j)² = 4 sum R_j²`` and every T_i stay exact bigints
    — the x4-scaled numerator/denominator identity
    ``W = (12*sum R2_j² - 12 n² k (k+1)²/4*4...)`` reduces to exact
    integer arithmetic; only the final ratio is double.

    Output (one row): (n_blocks, k, w).
    """
    k_total = df.select(treatment_col).distinct().count()
    complete = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("__nb"))
        .filter(F.col("__nb") == k_total)
        .select(block_col)
    )
    rows = df.join(complete, block_col)
    w_rank = Window.partitionBy(block_col).orderBy(value_col)
    w_tie = Window.partitionBy(block_col, value_col)
    ranked = rows.select(
        F.col(block_col).alias("__bl"),
        F.col(treatment_col).alias("__tr"),
        (
            2 * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        ).alias("__dr"),
    )
    per_tr = ranked.groupBy("__tr").agg(
        F.sum("__dr").cast("bigint").alias("__r2")
    )
    sums = per_tr.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("__r2") * F.col("__r2")).cast("bigint").alias("__sr22"),
    )
    ties = (
        rows.groupBy(block_col, value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
        .agg(
            F.sum(
                F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
            ).cast("bigint").alias("__tt")
        )
    )
    n_blocks = complete.count()
    j = sums.crossJoin(F.broadcast(ties))
    n = F.lit(n_blocks).cast("bigint")
    k = F.col("k")
    # with R2 = 2R: sum R² = sr22/4 -> W = (12*sr22/4 - 3n²k(k+1)²)
    #   / (n²k(k²-1) - n*tt) = (3*sr22 - 3n²k(k+1)²) / denom
    num = (
        3 * F.col("__sr22") - 3 * n * n * k * (k + 1) * (k + 1)
    ).cast("double")
    den = (n * n * k * (k * k - 1) - n * F.col("__tt")).cast("double")
    return j.select(
        n.alias("n_blocks"),
        k.alias("k"),
        F.round(num / den, round_to).alias("w"),
    )


def kendalls_w_sql(
    table_sql: str,
    block_col: str,
    treatment_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`kendalls_w`."""
    return f"""
    WITH t AS ({table_sql}),
    kt AS (SELECT CAST(COUNT(DISTINCT {treatment_col}) AS BIGINT) AS k
           FROM t),
    complete AS (
      SELECT {block_col} FROM t CROSS JOIN kt
      GROUP BY {block_col}, kt.k HAVING COUNT(*) = kt.k
    ),
    rows_c AS (SELECT t.* FROM t JOIN complete USING ({block_col})),
    ranked AS (
      SELECT {treatment_col} AS tr,
             2 * RANK() OVER (
               PARTITION BY {block_col} ORDER BY {value_col})
             + COUNT(*) OVER (
               PARTITION BY {block_col}, {value_col})
             - 1 AS dr
      FROM rows_c
    ),
    per_tr AS (
      SELECT tr, CAST(SUM(dr) AS BIGINT) AS r2 FROM ranked GROUP BY tr
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(r2 * r2) AS BIGINT) AS sr22
      FROM per_tr
    ),
    tiec AS (
      SELECT CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tt
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc
            FROM rows_c GROUP BY {block_col}, {value_col})
    ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM complete)
    SELECT nb.n AS n_blocks, sums.k,
           ROUND(CAST(3 * sums.sr22
                      - 3 * nb.n * nb.n * sums.k
                        * (sums.k + 1) * (sums.k + 1) AS DOUBLE)
                 / CAST(nb.n * nb.n * sums.k * (sums.k * sums.k - 1)
                        - nb.n * tiec.tt AS DOUBLE),
                 {round_to}) AS w
    FROM sums CROSS JOIN tiec CROSS JOIN nb
    """


def median_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Brown-Mood median test: do the k groups share a common median?
    Each observation is classified above/below the GRAND median
    (doubled-median order statistics — exact, no interpolation; ties
    AT the median drop, the standard treatment) and the k x 2
    above/below contingency is tested with Pearson chi-square. The
    crudest but most assumption-free of the k-sample location tests
    (`kruskal_wallis` uses full ranks; this uses one bit per row).

    Counts are exact integers; expecteds and chi2 run in double on
    bit-identical inputs. One ranked pass for the grand median (the
    scale-out two-pass global position would slot in beyond memory),
    one classification scan, k-row arithmetic.

    Output (one row): (k, n_used, n_dropped, chi2, dof).
    """
    x = F.col(value_col).cast("decimal(18,2)")
    vals = df.select(F.col(group_col).alias("__g"), x.alias("__x"))
    ranked = vals.withColumn(
        "__rn", F.row_number().over(Window.orderBy("__x"))
    )
    cnt = ranked.agg(F.max("__rn").alias("__n"))
    med2 = (
        ranked.crossJoin(F.broadcast(cnt))
        .filter(
            (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
            | (F.col("__rn") == F.ceil((F.col("__n") + 1) / 2))
        )
        .agg(
            F.when(F.count(F.lit(1)) == 1, F.sum("__x") * 2)
            .otherwise(F.sum("__x"))
            .cast("decimal(18,2)")
            .alias("__m2")
        )
    )
    classified = vals.crossJoin(F.broadcast(med2)).withColumn(
        "__above",
        F.when(F.col("__x") * 2 > F.col("__m2"), 1)
        .when(F.col("__x") * 2 < F.col("__m2"), 0)
        .otherwise(F.lit(None)),
    )
    per = classified.groupBy("__g").agg(
        F.sum((F.col("__above") == 1).cast("long")).cast("bigint").alias("__a"),
        F.sum((F.col("__above") == 0).cast("long")).cast("bigint").alias("__b"),
        F.sum(F.col("__above").isNull().cast("long")).cast("bigint").alias(
            "__d"
        ),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__a").cast("bigint").alias("__ta"),
        F.sum("__b").cast("bigint").alias("__tb"),
        F.sum("__d").cast("bigint").alias("__td"),
    )
    j = per.crossJoin(F.broadcast(tot))
    nn = (F.col("__ta") + F.col("__tb")).cast("double")
    ea = (F.col("__a") + F.col("__b")).cast("double") * F.col("__ta") / nn
    eb = (F.col("__a") + F.col("__b")).cast("double") * F.col("__tb") / nn
    chi_terms = (
        (F.col("__a").cast("double") - ea) * (F.col("__a").cast("double") - ea) / ea
        + (F.col("__b").cast("double") - eb) * (F.col("__b").cast("double") - eb) / eb
    )
    agg = j.groupBy("k", "__ta", "__tb", "__td").agg(
        F.sum(chi_terms).alias("__chi2")
    )
    return agg.select(
        "k",
        (F.col("__ta") + F.col("__tb")).cast("bigint").alias("n_used"),
        F.col("__td").alias("n_dropped"),
        F.round("__chi2", round_to).alias("chi2"),
        (F.col("k") - 1).cast("bigint").alias("dof"),
    )


def median_test_sql(
    table: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`median_test`."""
    return f"""
    WITH vals AS (
      SELECT {group_col} AS g, CAST({value_col} AS DECIMAL(18,2)) AS x
      FROM {table}
    ),
    ranked AS (
      SELECT g, x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM vals
    ),
    cnt AS (SELECT MAX(rn) AS n FROM ranked),
    med2 AS (
      SELECT CAST(CASE WHEN COUNT(*) = 1 THEN SUM(x) * 2 ELSE SUM(x) END
                  AS DECIMAL(18,2)) AS m2
      FROM ranked CROSS JOIN cnt
      WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    ),
    classified AS (
      SELECT g,
             CASE WHEN x * 2 > m2 THEN 1
                  WHEN x * 2 < m2 THEN 0
                  ELSE NULL END AS above
      FROM vals CROSS JOIN med2
    ),
    per AS (
      SELECT g,
             CAST(SUM(CASE WHEN above = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(SUM(CASE WHEN above = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS b,
             CAST(SUM(CASE WHEN above IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS d
      FROM classified GROUP BY g
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(a) AS BIGINT) AS ta,
             CAST(SUM(b) AS BIGINT) AS tb,
             CAST(SUM(d) AS BIGINT) AS td
      FROM per
    ),
    agg AS (
      SELECT tot.k, tot.ta, tot.tb, tot.td,
             SUM((CAST(a AS DOUBLE)
                  - CAST(a + b AS DOUBLE) * tot.ta
                    / CAST(tot.ta + tot.tb AS DOUBLE))
                 * (CAST(a AS DOUBLE)
                    - CAST(a + b AS DOUBLE) * tot.ta
                      / CAST(tot.ta + tot.tb AS DOUBLE))
                 / (CAST(a + b AS DOUBLE) * tot.ta
                    / CAST(tot.ta + tot.tb AS DOUBLE))
                 + (CAST(b AS DOUBLE)
                    - CAST(a + b AS DOUBLE) * tot.tb
                      / CAST(tot.ta + tot.tb AS DOUBLE))
                   * (CAST(b AS DOUBLE)
                      - CAST(a + b AS DOUBLE) * tot.tb
                        / CAST(tot.ta + tot.tb AS DOUBLE))
                   / (CAST(a + b AS DOUBLE) * tot.tb
                      / CAST(tot.ta + tot.tb AS DOUBLE))) AS chi2
      FROM per CROSS JOIN tot
      GROUP BY tot.k, tot.ta, tot.tb, tot.td
    )
    SELECT k,
           CAST(ta + tb AS BIGINT) AS n_used,
           td AS n_dropped,
           ROUND(chi2, {round_to}) AS chi2,
           CAST(k - 1 AS BIGINT) AS dof
    FROM agg
    """


def cronbachs_alpha(
    df: DataFrame,
    block_col: str,
    item_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cronbach's alpha — internal-consistency reliability of k
    "items" measured over common blocks (here: do the per-type daily
    volumes move together day to day, i.e. is total daily volume a
    reliable single scale?):

      ``alpha = k/(k-1) * (1 - sum_i var_i / var_total)``

    with var_i the per-item variance across blocks and var_total the
    variance of the per-block item SUM. Only COMPLETE blocks enter
    (identical filter both engines). Values are integer counts, so
    every moment (per-item sums/squares, block-sum squares)
    accumulates as an exact bigint; sample variances share the same
    (n-1) denominator, so alpha reduces to exact-integer numerators
    over one double ratio.

    Output (one row): (n_blocks, k, sum_item_var, total_var, alpha).
    """
    k_total = df.select(item_col).distinct().count()
    complete = (
        df.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("__nb"))
        .filter(F.col("__nb") == k_total)
        .select(block_col)
    )
    rows = df.join(complete, block_col).select(
        F.col(block_col).alias("__b"),
        F.col(item_col).alias("__i"),
        F.col(value_col).cast("bigint").alias("__x"),
    )
    n_blocks = complete.count()
    n = F.lit(n_blocks).cast("bigint")
    per_item = rows.groupBy("__i").agg(
        F.sum("__x").cast("bigint").alias("__s"),
        F.sum(F.col("__x") * F.col("__x")).cast("bigint").alias("__s2"),
    )
    # n*sum(x^2) - sum(x)^2 = n(n-1) * var -> exact integer numerators
    item_num = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            n * F.col("__s2") - F.col("__s") * F.col("__s")
        ).cast("bigint").alias("__iv"),
    )
    per_block = rows.groupBy("__b").agg(
        F.sum("__x").cast("bigint").alias("__t")
    )
    tot_num = per_block.agg(
        (
            n * F.sum(F.col("__t") * F.col("__t"))
            - F.sum("__t") * F.sum("__t")
        ).cast("bigint").alias("__tv")
    )
    j = item_num.crossJoin(F.broadcast(tot_num))
    k = F.col("k")
    denom = (n * (n - 1)).cast("double")
    alpha = (k.cast("double") / (k - 1).cast("double")) * (
        1.0 - F.col("__iv").cast("double") / F.col("__tv").cast("double")
    )
    return j.select(
        n.alias("n_blocks"),
        k.alias("k"),
        F.round(F.col("__iv").cast("double") / denom, round_to).alias(
            "sum_item_var"
        ),
        F.round(F.col("__tv").cast("double") / denom, round_to).alias(
            "total_var"
        ),
        F.round(alpha, round_to).alias("alpha"),
    )


def cronbachs_alpha_sql(
    table_sql: str,
    block_col: str,
    item_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cronbachs_alpha`."""
    return f"""
    WITH t AS ({table_sql}),
    kt AS (SELECT CAST(COUNT(DISTINCT {item_col}) AS BIGINT) AS k FROM t),
    complete AS (
      SELECT {block_col} FROM t CROSS JOIN kt
      GROUP BY {block_col}, kt.k HAVING COUNT(*) = kt.k
    ),
    rows_c AS (
      SELECT t.{block_col} AS b, t.{item_col} AS i,
             CAST(t.{value_col} AS BIGINT) AS x
      FROM t JOIN complete USING ({block_col})
    ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM complete),
    per_item AS (
      SELECT i, CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS s2
      FROM rows_c GROUP BY i
    ),
    item_num AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(nb.n * s2 - s * s) AS BIGINT) AS iv
      FROM per_item CROSS JOIN nb
    ),
    per_block AS (
      SELECT b, CAST(SUM(x) AS BIGINT) AS tt FROM rows_c GROUP BY b
    ),
    tot_num AS (
      SELECT CAST(nb.n * SUM(tt * tt) - SUM(tt) * SUM(tt) AS BIGINT) AS tv
      FROM per_block CROSS JOIN nb
      GROUP BY nb.n
    )
    SELECT nb.n AS n_blocks, item_num.k,
           ROUND(CAST(item_num.iv AS DOUBLE)
                 / CAST(nb.n * (nb.n - 1) AS DOUBLE), {round_to})
             AS sum_item_var,
           ROUND(CAST(tot_num.tv AS DOUBLE)
                 / CAST(nb.n * (nb.n - 1) AS DOUBLE), {round_to})
             AS total_var,
           ROUND((CAST(item_num.k AS DOUBLE)
                  / CAST(item_num.k - 1 AS DOUBLE))
                 * (1.0 - CAST(item_num.iv AS DOUBLE)
                          / CAST(tot_num.tv AS DOUBLE)),
                 {round_to}) AS alpha
    FROM item_num CROSS JOIN tot_num CROSS JOIN nb
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 77: moment-based normality + ordered-alternative trend
# ──────────────────────────────────────────────────────────────────────────


def jarque_bera(
    df: DataFrame,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Jarque-Bera normality test from exact integer power sums —
    skewness and excess kurtosis of an integer-valued column (doc
    lengths here), then ``JB = n/6 * (S² + (K-3)²/4)``; the
    moment-based normality gate that complements the distribution-
    shape family (anderson_darling, ks_test, qq):

      ``m_r = central moments``, ``S = m3/m2^1.5``, ``K = m4/m2²``.

    Exactness: the four raw power sums Σx, Σx², Σx³, Σx⁴ accumulate
    as EXACT bigints in one map-side-combined aggregate; the central-
    moment expansion runs in double on bit-identical inputs with one
    spelled-out operation order shared by both engines.

    Output (one row): (n, mean, skewness, kurtosis, jb_stat).
    """
    x = F.col(value_col).cast("bigint")
    m = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(x).cast("bigint").alias("__s1"),
        F.sum(x * x).cast("bigint").alias("__s2"),
        F.sum(x * x * x).cast("bigint").alias("__s3"),
        F.sum(x * x * x * x).cast("bigint").alias("__s4"),
    )
    nn = F.col("__n").cast("double")
    mu = F.col("__s1").cast("double") / nn
    m2 = F.col("__s2").cast("double") / nn - mu * mu
    m3 = (
        F.col("__s3").cast("double") / nn
        - 3.0 * mu * (F.col("__s2").cast("double") / nn)
        + 2.0 * mu * mu * mu
    )
    m4 = (
        F.col("__s4").cast("double") / nn
        - 4.0 * mu * (F.col("__s3").cast("double") / nn)
        + 6.0 * mu * mu * (F.col("__s2").cast("double") / nn)
        - 3.0 * mu * mu * mu * mu
    )
    s = m3 / (m2 * F.sqrt(m2))
    k = m4 / (m2 * m2)
    jb = nn / 6.0 * (s * s + (k - 3.0) * (k - 3.0) / 4.0)
    return m.select(
        F.col("__n").alias("n"),
        F.round(mu, round_to).alias("mean"),
        F.round(s, round_to).alias("skewness"),
        F.round(k, round_to).alias("kurtosis"),
        F.round(jb, round_to).alias("jb_stat"),
    )


def jarque_bera_sql(
    table: str,
    value_expr: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`jarque_bera` (identical expansion order)."""
    x = f"CAST({value_expr} AS BIGINT)"
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({x}) AS BIGINT) AS s1,
             CAST(SUM({x} * {x}) AS BIGINT) AS s2,
             CAST(SUM({x} * {x} * {x}) AS BIGINT) AS s3,
             CAST(SUM({x} * {x} * {x} * {x}) AS BIGINT) AS s4
      FROM {table}
    ),
    c AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM m
    ),
    cm AS (
      SELECT n, mu,
             r2 - mu * mu AS m2,
             r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
             r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                - 3.0 * mu * mu * mu * mu AS m4
      FROM c
    )
    SELECT n,
           ROUND(mu, {round_to}) AS mean,
           ROUND(m3 / (m2 * SQRT(m2)), {round_to}) AS skewness,
           ROUND(m4 / (m2 * m2), {round_to}) AS kurtosis,
           ROUND(CAST(n AS DOUBLE) / 6.0
                 * ((m3 / (m2 * SQRT(m2))) * (m3 / (m2 * SQRT(m2)))
                    + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                      / 4.0),
                 {round_to}) AS jb_stat
    FROM cm
    """


def jonckheere_terpstra(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative across k
    ordinal groups — "does the value tend to RISE with the group
    code", the directional upgrade to `kruskal_wallis` (which only
    asks "differ?"). ``JT = sum over group pairs i<j of U_ij`` with
    ties counted half; doubled counts keep JT exact:

      ``2*JT = sum_{gi<gj, cells} o_i * o_j * (2*[v_j > v_i] + [v_j = v_i])``

    z uses the standard NO-TIE null moments (documented convention,
    identical in both engines): ``E = (N² - Σn_i²)/4``,
    ``Var = (N²(2N+3) - Σn_i²(2n_i+3))/72``.

    Scale shape (the round-5 rewrite): the naive grid self-join is
    cells² — QUADRATIC when the value is continuous (every row its
    own cell; at sf0.1 the o_totalprice grid is ~150k rows and the
    pair join never finishes). Instead the k per-group counts pivot
    into columns of the DISTINCT-VALUE table and 2·JT reduces to one
    ordered prefix-sum pass:

      ``2·JT = Σ_v Σ_{i<j} o_j(v) · (2·below_i(v) + o_i(v))``

    with ``below_i(v)`` the count of group-i observations strictly
    below v — O(V log V), one range shuffle. The prefix sums use the
    two-phase distributed scan (range-partition, local window,
    broadcast partition offsets), never a single-task global window.
    The ordinal group codes are collected once (k-sized list, driver-
    side-small by definition of an ordered-alternative test; guarded
    at 64).

    Output (one row): (n, k, jt2 BIGINT = 2*JT, jt, z).
    """
    g = F.col(group_col).cast("bigint")
    v = F.col(value_col).cast("decimal(18,2)")
    src = df.select(g.alias("__g"), v.alias("__v"))
    groups = sorted(
        r[0] for r in src.select("__g").distinct().collect() if r[0] is not None
    )
    if len(groups) > 64:
        raise ValueError(
            f"jonckheere_terpstra: {len(groups)} group codes; an ordered-"
            "alternative test wants a small ordinal scale (<= 64)"
        )
    cells = src.groupBy("__v").agg(
        *[
            F.sum((F.col("__g") == gi).cast("long"))
            .cast("bigint")
            .alias(f"__o{idx}")
            for idx, gi in enumerate(groups)
        ]
    )
    # two-phase prefix sums for every group column at once: range
    # shuffle on value, per-partition inclusive window, partition
    # totals offset via a #partitions-row window, broadcast back
    parts = cells.repartitionByRange("__v").withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.select(
        "*",
        *[
            F.sum(f"__o{i}").over(w_local).alias(f"__c{i}")
            for i in range(len(groups))
        ],
    )
    totals = local.groupBy("__pid").agg(
        *[F.sum(f"__o{i}").alias(f"__t{i}") for i in range(len(groups))]
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__t{i}").over(w_off), F.lit(0)).alias(
                f"__off{i}"
            )
            for i in range(len(groups))
        ],
    )
    cum = local.join(F.broadcast(offsets), "__pid")
    # below_i = inclusive cum - own count (one row per distinct value)
    contrib = None
    for jdx in range(len(groups)):
        for idx in range(jdx):
            below_i = (
                F.col(f"__c{idx}") + F.col(f"__off{idx}") - F.col(f"__o{idx}")
            )
            term = F.col(f"__o{jdx}") * (2 * below_i + F.col(f"__o{idx}"))
            contrib = term if contrib is None else contrib + term
    jt2 = cum.agg(
        F.coalesce(F.sum(contrib), F.lit(0)).cast("bigint").alias("__jt2")
    )
    sizes = cells.agg(
        *[
            F.sum(f"__o{i}").cast("bigint").alias(f"__n{i}")
            for i in range(len(groups))
        ]
    ).select(
        F.explode(
            F.array(*[F.col(f"__n{i}") for i in range(len(groups))])
        ).alias("__ni")
    ).filter(F.col("__ni") > 0)
    tot = sizes.agg(
        F.sum("__ni").cast("bigint").alias("__nn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("__ni") * F.col("__ni")).cast("bigint").alias("__sn2"),
        F.sum(
            F.col("__ni") * F.col("__ni") * (2 * F.col("__ni") + 3)
        ).cast("bigint").alias("__sn23"),
    )
    j = jt2.crossJoin(F.broadcast(tot))
    nn = F.col("__nn").cast("double")
    e = (nn * nn - F.col("__sn2").cast("double")) / 4.0
    var = (
        nn * nn * (2.0 * nn + 3.0) - F.col("__sn23").cast("double")
    ) / 72.0
    jt = F.col("__jt2").cast("double") / 2.0
    z = F.when(var > 0, (jt - e) / F.sqrt(var))
    return j.select(
        F.col("__nn").alias("n"),
        "k",
        F.col("__jt2").alias("jt2"),
        jt.alias("jt"),
        F.round(z, round_to).alias("z"),
    )


def jonckheere_terpstra_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    groups: tuple = (1, 2, 3, 4, 5),
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`jonckheere_terpstra` (same pivoted
    prefix-sum form — the grid self-join is quadratic on continuous
    values; ``groups`` unrolls the known ordinal codes)."""
    o_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN g = {gi} THEN 1 ELSE 0 END) AS BIGINT) AS o{i}"
        for i, gi in enumerate(groups)
    )
    c_cols = ",\n             ".join(
        f"SUM(o{i}) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW) AS c{i}"
        for i in range(len(groups))
    )
    terms = []
    for jdx in range(len(groups)):
        for idx in range(jdx):
            terms.append(
                f"o{jdx} * (2 * (c{idx} - o{idx}) + o{idx})"
            )
    contrib = "\n               + ".join(terms)
    n_cols = ", ".join(
        f"CAST(SUM(o{i}) AS BIGINT) AS n{i}" for i in range(len(groups))
    )
    n_list = ", ".join(f"n{i}" for i in range(len(groups)))
    return f"""
    WITH src AS (
      SELECT CAST({group_expr} AS BIGINT) AS g,
             CAST({value_expr} AS DECIMAL(18,2)) AS v
      FROM {table}
    ),
    cells AS (
      SELECT v,
             {o_cols}
      FROM src GROUP BY v
    ),
    cum AS (
      SELECT *,
             {c_cols}
      FROM cells
    ),
    jt AS (
      SELECT CAST(COALESCE(SUM({contrib}), 0) AS BIGINT) AS jt2
      FROM cum
    ),
    nsum AS (SELECT {n_cols} FROM cells),
    sizes AS (
      SELECT ni FROM (SELECT unnest([{n_list}]) AS ni FROM nsum)
      WHERE ni > 0
    ),
    tot AS (
      SELECT CAST(SUM(ni) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ni * ni) AS BIGINT) AS sn2,
             CAST(SUM(ni * ni * (2 * ni + 3)) AS BIGINT) AS sn23
      FROM sizes
    )
    SELECT tot.nn AS n, tot.k, jt.jt2,
           CAST(jt.jt2 AS DOUBLE) / 2.0 AS jt,
           ROUND(CASE WHEN (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                            * (2.0 * CAST(nn AS DOUBLE) + 3.0)
                            - CAST(sn23 AS DOUBLE)) / 72.0 > 0
                 THEN (CAST(jt.jt2 AS DOUBLE) / 2.0
                       - (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                          - CAST(sn2 AS DOUBLE)) / 4.0)
                      / SQRT((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                              * (2.0 * CAST(nn AS DOUBLE) + 3.0)
                              - CAST(sn23 AS DOUBLE)) / 72.0)
                 END, {round_to}) AS z
    FROM jt CROSS JOIN tot
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 81: normality/variance battery + circular uniformity
# ──────────────────────────────────────────────────────────────────────────
def dagostino_k2(
    df: DataFrame,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """D'Agostino-Pearson K² omnibus normality test — the finite-
    sample-calibrated upgrade to :func:`jarque_bera` (JB compares raw
    b1/b2 to their ASYMPTOTIC null; K² first maps each through its
    exact-moment normalizing transform, so the statistic is usable at
    the daily/grouped sample sizes this suite actually produces):

      Z1 = delta * ln(Y/alpha + sqrt((Y/alpha)² + 1))   (skew,
           Johnson SU transform), Z2 = Anscombe-Glynn cube-root
           transform of b2;  K² = Z1² + Z2².

    Same exactness discipline as jarque_bera: four exact-bigint power
    sums in one map-side-combined aggregate; every constant of the
    transforms is a ratio of exact integer polynomials in n, and the
    scalar chain (ln/sqrt/cbrt, both engines' libm) is spelled in ONE
    shared operation order.

    Output (one row): (n, skew_z, kurt_z, k2_stat).
    """
    x = F.col(value_col).cast("bigint")
    m = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(x).cast("bigint").alias("__s1"),
        F.sum(x * x).cast("bigint").alias("__s2"),
        F.sum(x * x * x).cast("bigint").alias("__s3"),
        F.sum(x * x * x * x).cast("bigint").alias("__s4"),
    )
    nn = F.col("__n").cast("double")
    mu = F.col("__s1").cast("double") / nn
    r2 = F.col("__s2").cast("double") / nn
    r3 = F.col("__s3").cast("double") / nn
    r4 = F.col("__s4").cast("double") / nn
    m2 = r2 - mu * mu
    m3 = r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu
    m4 = r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu * mu * mu * mu
    cm = m.select(
        "__n",
        m2.alias("m2"),
        m3.alias("m3"),
        m4.alias("m4"),
    )
    nn2 = F.col("__n").cast("double")
    b1 = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    b2 = F.col("m4") / (F.col("m2") * F.col("m2"))
    shape = cm.select("__n", b1.alias("b1"), b2.alias("b2"))
    n = F.col("__n").cast("double")
    # --- skewness: Johnson SU (D'Agostino 1970) ---
    yy = F.col("b1") * F.sqrt(
        ((n + 1.0) * (n + 3.0)) / (6.0 * (n - 2.0))
    )
    beta2 = (
        3.0
        * (n * n + 27.0 * n - 70.0)
        * (n + 1.0)
        * (n + 3.0)
        / ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    )
    w2 = -1.0 + F.sqrt(2.0 * (beta2 - 1.0))
    delta = 1.0 / F.sqrt(F.log(F.sqrt(w2)))
    alpha = F.sqrt(2.0 / (w2 - 1.0))
    z1 = delta * F.log(
        yy / alpha + F.sqrt((yy / alpha) * (yy / alpha) + 1.0)
    )
    # --- kurtosis: Anscombe-Glynn (1983) ---
    eb2 = 3.0 * (n - 1.0) / (n + 1.0)
    vb2 = (
        24.0
        * n
        * (n - 2.0)
        * (n - 3.0)
        / ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
    )
    xx = (F.col("b2") - eb2) / F.sqrt(vb2)
    sb1 = (
        6.0
        * (n * n - 5.0 * n + 2.0)
        / ((n + 7.0) * (n + 9.0))
    ) * F.sqrt(
        6.0 * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0))
    )
    aa = 6.0 + (8.0 / sb1) * (
        2.0 / sb1 + F.sqrt(1.0 + 4.0 / (sb1 * sb1))
    )
    z2 = (
        (1.0 - 2.0 / (9.0 * aa))
        - F.cbrt(
            (1.0 - 2.0 / aa)
            / (1.0 + xx * F.sqrt(2.0 / (aa - 4.0)))
        )
    ) / F.sqrt(2.0 / (9.0 * aa))
    return shape.select(
        F.col("__n").alias("n"),
        F.round(z1, round_to).alias("skew_z"),
        F.round(z2, round_to).alias("kurt_z"),
        F.round(z1 * z1 + z2 * z2, round_to).alias("k2_stat"),
    )


def dagostino_k2_sql(
    table: str,
    value_expr: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`dagostino_k2` (identical operation
    order through the Johnson SU / Anscombe-Glynn chains)."""
    x = f"CAST({value_expr} AS BIGINT)"
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({x}) AS BIGINT) AS s1,
             CAST(SUM({x} * {x}) AS BIGINT) AS s2,
             CAST(SUM({x} * {x} * {x}) AS BIGINT) AS s3,
             CAST(SUM({x} * {x} * {x} * {x}) AS BIGINT) AS s4
      FROM {table}
    ),
    c AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM m
    ),
    cm AS (
      SELECT n,
             r2 - mu * mu AS m2,
             r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
             r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                - 3.0 * mu * mu * mu * mu AS m4
      FROM c
    ),
    shape AS (
      SELECT n,
             m3 / (m2 * SQRT(m2)) AS b1,
             m4 / (m2 * m2) AS b2,
             CAST(n AS DOUBLE) AS nd
      FROM cm
    ),
    skewt AS (
      SELECT *,
             b1 * SQRT(((nd + 1.0) * (nd + 3.0)) / (6.0 * (nd - 2.0))) AS yy,
             -1.0 + SQRT(2.0 * (3.0 * (nd * nd + 27.0 * nd - 70.0)
               * (nd + 1.0) * (nd + 3.0)
               / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0))
               - 1.0)) AS w2
      FROM shape
    ),
    z1t AS (
      SELECT *,
             (1.0 / SQRT(LN(SQRT(w2))))
             * LN(yy / SQRT(2.0 / (w2 - 1.0))
                  + SQRT((yy / SQRT(2.0 / (w2 - 1.0)))
                         * (yy / SQRT(2.0 / (w2 - 1.0))) + 1.0)) AS z1
      FROM skewt
    ),
    kurt AS (
      SELECT *,
             (b2 - 3.0 * (nd - 1.0) / (nd + 1.0))
             / SQRT(24.0 * nd * (nd - 2.0) * (nd - 3.0)
                    / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0)))
               AS xx,
             (6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * (nd + 9.0)))
             * SQRT(6.0 * (nd + 3.0) * (nd + 5.0)
                    / (nd * (nd - 2.0) * (nd - 3.0))) AS sb1
      FROM z1t
    ),
    z2t AS (
      SELECT *,
             ((1.0 - 2.0 / (9.0 * (6.0 + (8.0 / sb1)
                 * (2.0 / sb1 + SQRT(1.0 + 4.0 / (sb1 * sb1))))))
              - CBRT((1.0 - 2.0 / (6.0 + (8.0 / sb1)
                   * (2.0 / sb1 + SQRT(1.0 + 4.0 / (sb1 * sb1)))))
                / (1.0 + xx * SQRT(2.0 / ((6.0 + (8.0 / sb1)
                     * (2.0 / sb1 + SQRT(1.0 + 4.0 / (sb1 * sb1)))) - 4.0)))))
             / SQRT(2.0 / (9.0 * (6.0 + (8.0 / sb1)
                 * (2.0 / sb1 + SQRT(1.0 + 4.0 / (sb1 * sb1)))))) AS z2
      FROM kurt
    )
    SELECT n,
           ROUND(z1, {round_to}) AS skew_z,
           ROUND(z2, {round_to}) AS kurt_z,
           ROUND(z1 * z1 + z2 * z2, {round_to}) AS k2_stat
    FROM z2t
    """


def bartlett_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Bartlett's test for homogeneity of variances across k groups —
    the likelihood-ratio (normal-theory) member of the variance
    battery next to :func:`levene_brown_forsythe` (Levene is robust
    to non-normality; Bartlett is the more powerful test when the
    normality gates — jarque_bera, dagostino_k2 — pass):

      ``T = ((N-k) ln s_p² - Σ (n_i-1) ln s_i²) / C``,
      ``C = 1 + (Σ 1/(n_i-1) - 1/(N-k)) / (3(k-1))``.

    Same exactness discipline as :func:`anova_f` (r8, VERDICT r7 #2 —
    the same knife edge one module down): per-group moments are exact
    DECIMAL sums (x and x*x are DECIMAL-exact, order-free), and the
    knife-edge output ``pooled_var`` (magnitude ~2e10 under
    ROUND(x,6), double ulp within 4× of the rounding grain) is now
    computed from order-free pieces only: ssw_tot = double(Σs2) − T
    where Σs2 stays exact DECIMAL and T = Σ_g s_g²/n_g is a left fold
    in sorted group-key order, mirrored in the DuckDB twin. The ln
    chain (bartlett_stat) runs in double on bit-identical inputs; its
    magnitude (O(1..100)) keeps libm's last-ulp freedom far below the
    rounding grain. Groups with n_i < 2 are excluded (their variance
    is undefined), documented.

    Output contract (re-cut in r8): the pooled variance (~2e10 for a
    ~1e5-scale measure) sits above the 2^53/1e6 = 9.0e9 bound where
    DuckDB's multiply-based ``ROUND(x, 6)`` stops being exact, so the
    emitted column is ``pooled_sd = sqrt(pooled_var)`` (~1.4e5) —
    IEEE sqrt is correctly rounded, so bit-identical inputs stay
    bit-identical, and the magnitude is squarely in the exact-ROUND
    regime in both engines.

    Output (one row): (k, n, pooled_sd, bartlett_stat).
    """
    per = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__s"),
            F.sum(
                F.col(value_col).cast("decimal(18,2)")
                * F.col(value_col).cast("decimal(18,2)")
            ).alias("__s2"),
        )
        .filter(F.col("__n") >= 2)
    )
    ni = F.col("__n").cast("double")
    ssw_i = (
        F.col("__s2").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double") / ni
    )
    var_i = ssw_i / (ni - 1.0)
    stats = per.select(
        F.col(group_col).alias("__g"),
        "__n",
        "__s",
        "__s2",
        ((ni - 1.0) * F.log(var_i)).alias("__nlnv"),
        (1.0 / (ni - 1.0)).alias("__inv"),
    )
    agg = stats.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__n").cast("bigint").alias("n"),
        F.sum("__s2").alias("__S2_dec"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__g").alias("g"),
                    F.col("__n").alias("gn"),
                    F.col("__s").alias("gs"),
                )
            )
        ).alias("__groups"),
        F.sum("__nlnv").alias("__sum_nlnv"),
        F.sum("__inv").alias("__sum_inv"),
    )
    t_fold = F.aggregate(
        F.transform(
            F.col("__groups"),
            lambda x: x["gs"].cast("double")
            * x["gs"].cast("double")
            / x["gn"].cast("double"),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    agg = agg.select(
        "k",
        "n",
        (F.col("__S2_dec").cast("double") - t_fold).alias("__ssw_tot"),
        "__sum_nlnv",
        "__sum_inv",
    )
    nn = F.col("n").cast("double")
    kk = F.col("k").cast("double")
    sp2 = F.col("__ssw_tot") / (nn - kk)
    t = (nn - kk) * F.log(sp2) - F.col("__sum_nlnv")
    c = 1.0 + (F.col("__sum_inv") - 1.0 / (nn - kk)) / (3.0 * (kk - 1.0))
    return agg.select(
        "k",
        "n",
        F.round(F.sqrt(sp2), round_to).alias("pooled_sd"),
        F.round(t / c, round_to).alias("bartlett_stat"),
    )


def bartlett_test_sql(
    table: str,
    group_expr: str,
    value_expr: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`bartlett_test`."""
    v = f"CAST({value_expr} AS DECIMAL(18,2))"
    return f"""
    WITH per AS (
      SELECT {group_expr} AS g,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             SUM({v}) AS s,
             SUM({v} * {v}) AS s2
      FROM {table} GROUP BY 1
      HAVING COUNT(*) >= 2
    ),
    stats AS (
      SELECT g, n_i, s, s2,
             (CAST(n_i AS DOUBLE) - 1.0)
               * LN((CAST(s2 AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n_i AS DOUBLE))
                    / (CAST(n_i AS DOUBLE) - 1.0)) AS nlnv,
             1.0 / (CAST(n_i AS DOUBLE) - 1.0) AS inv
      FROM per
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(SUM(s2) AS DOUBLE)
               - list_reduce(
                   list_prepend(
                     CAST(0.0 AS DOUBLE),
                     LIST(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n_i AS DOUBLE) ORDER BY g)),
                   (acc, t) -> acc + t) AS ssw_tot,
             SUM(nlnv) AS sum_nlnv,
             SUM(inv) AS sum_inv
      FROM stats
    )
    SELECT k, n,
           ROUND(SQRT(ssw_tot / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))),
                 {round_to}) AS pooled_sd,
           ROUND(((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                  * LN(ssw_tot / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                  - sum_nlnv)
                 / (1.0 + (sum_inv
                           - 1.0 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                          / (3.0 * (CAST(k AS DOUBLE) - 1.0))),
                 {round_to}) AS bartlett_stat
    FROM agg
    """


def kuiper_uniformity(
    df: DataFrame,
    cell_col: str,
    n_cells: int,
    round_to: int = 6,
) -> DataFrame:
    """Kuiper's V test of uniformity over an ordered CYCLIC category
    (day-of-week here) — the circular complement to the KS family:
    KS's D is blind to deviations that straddle the cycle's cut point
    (a weekend bulge splits into week-start deficit + week-end
    excess); V = D+ + D- is rotation-invariant, so it sees them.

    Convention (documented, identical in both engines): cells are the
    integers 0..n_cells-1, the null CDF at cell i is (i+1)/n_cells,
    D+ = max_i(F_i - E_i), D- = max_i(E_i - F_i) over the observed
    cumulative proportions F_i, and the studentized statistic is
    ``V * (sqrt(N) + 0.155 + 0.24/sqrt(N))`` (Stephens 1970). Counts
    are exact bigints; the cumulative pass runs over the n_cells-row
    rollup, never the corpus.

    Output (one row): (n, n_cells, d_plus, d_minus, v_stat, v_mod).
    """
    counts = df.groupBy(
        F.col(cell_col).cast("int").alias("__cell")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    w = Window.orderBy("__cell").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_row = counts.agg(F.sum("__c").cast("bigint").alias("__n"))
    cum = (
        counts.withColumn("__cum", F.sum("__c").over(w))
        .crossJoin(F.broadcast(n_row))
        .select(
            "__n",
            (F.col("__cum").cast("double") / F.col("__n").cast("double"))
            .alias("__f"),
            (
                (F.col("__cell").cast("double") + 1.0) / float(n_cells)
            ).alias("__e"),
        )
    )
    agg = cum.agg(
        F.max("__n").alias("n"),
        F.max(F.col("__f") - F.col("__e")).alias("__dp"),
        F.max(F.col("__e") - F.col("__f")).alias("__dm"),
    )
    dp = F.greatest(F.col("__dp"), F.lit(0.0))
    dm = F.greatest(F.col("__dm"), F.lit(0.0))
    v = dp + dm
    rn = F.sqrt(F.col("n").cast("double"))
    return agg.select(
        "n",
        F.lit(n_cells).cast("int").alias("n_cells"),
        F.round(dp, round_to).alias("d_plus"),
        F.round(dm, round_to).alias("d_minus"),
        F.round(v, round_to).alias("v_stat"),
        F.round(v * (rn + 0.155 + 0.24 / rn), round_to).alias("v_mod"),
    )


def kuiper_uniformity_sql(
    table_sql: str,
    cell_expr: str,
    n_cells: int,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`kuiper_uniformity`; ``table_sql`` is a
    full SELECT producing the rows."""
    return f"""
    WITH src AS ({table_sql}),
    counts AS (
      SELECT CAST({cell_expr} AS INTEGER) AS cell,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM src GROUP BY 1
    ),
    n_row AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
    cum AS (
      SELECT n,
             CAST(SUM(c) OVER (ORDER BY cell
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS DOUBLE)
               / CAST(n AS DOUBLE) AS f,
             (CAST(cell AS DOUBLE) + 1.0) / {float(n_cells)!r} AS e
      FROM counts CROSS JOIN n_row
    ),
    agg AS (
      SELECT MAX(n) AS n,
             MAX(f - e) AS dp_raw,
             MAX(e - f) AS dm_raw
      FROM cum
    )
    SELECT n,
           CAST({n_cells} AS INTEGER) AS n_cells,
           ROUND(GREATEST(dp_raw, 0.0), {round_to}) AS d_plus,
           ROUND(GREATEST(dm_raw, 0.0), {round_to}) AS d_minus,
           ROUND(GREATEST(dp_raw, 0.0) + GREATEST(dm_raw, 0.0),
                 {round_to}) AS v_stat,
           ROUND((GREATEST(dp_raw, 0.0) + GREATEST(dm_raw, 0.0))
                 * (SQRT(CAST(n AS DOUBLE)) + 0.155
                    + 0.24 / SQRT(CAST(n AS DOUBLE))),
                 {round_to}) AS v_mod
    FROM agg
    """


def gate_confusion_metrics(
    df: DataFrame,
    gate_truth: Column,
    gate_pred: Column,
    round_to: int = 9,
) -> DataFrame:
    """Binary-confusion metric battery between a reference gate and a
    candidate gate — the numbers a filter swap actually gets judged
    on, complementing :func:`cohens_kappa`'s agreement view:

      MCC     = (n11 n00 - n10 n01) / sqrt((n11+n10)(n11+n01)(n00+n10)(n00+n01))
      Youden J = recall + specificity - 1
      F1      = 2 n11 / (2 n11 + n10 + n01)
      odds ratio = (n11 n00) / (n10 n01), with the Wald 95% CI on
      ln OR (±1.96 sqrt(Σ 1/cell)).

    One conditional-aggregate pass produces the four exact bigint
    cells; every factor casts to double BEFORE multiplying (the raw
    bigint product overflows at crawl scale), one shared IEEE order.
    Degenerate margins (a zero cell) NULL the affected ratios rather
    than fabricating a continuity correction, documented.

    Output (one row): (n11, n10, n01, n00, mcc, youden_j, f1,
    odds_ratio, log_or_lo, log_or_hi).
    """
    t = gate_truth.cast("int")
    p = gate_pred.cast("int")
    agg = df.agg(
        F.sum(t * p).cast("bigint").alias("n11"),
        F.sum(t * (1 - p)).cast("bigint").alias("n10"),
        F.sum((1 - t) * p).cast("bigint").alias("n01"),
        F.sum((1 - t) * (1 - p)).cast("bigint").alias("n00"),
    )
    a = F.col("n11").cast("double")
    b = F.col("n10").cast("double")
    c = F.col("n01").cast("double")
    d = F.col("n00").cast("double")
    denom = F.sqrt((a + b) * (a + c) * (d + b) * (d + c))
    mcc = F.when(denom > 0, (a * d - b * c) / denom)
    recall = F.when(a + b > 0, a / (a + b))
    spec = F.when(d + c > 0, d / (d + c))
    f1 = F.when(2.0 * a + b + c > 0, 2.0 * a / (2.0 * a + b + c))
    all_pos = (
        (F.col("n11") > 0)
        & (F.col("n10") > 0)
        & (F.col("n01") > 0)
        & (F.col("n00") > 0)
    )
    orr = F.when(all_pos, (a * d) / (b * c))
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    log_or = F.log((a * d) / (b * c))
    return agg.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(mcc, round_to).alias("mcc"),
        F.round(recall + spec - 1.0, round_to).alias("youden_j"),
        F.round(f1, round_to).alias("f1"),
        F.round(orr, round_to).alias("odds_ratio"),
        F.round(F.when(all_pos, log_or - 1.96 * se), round_to).alias(
            "log_or_lo"
        ),
        F.round(F.when(all_pos, log_or + 1.96 * se), round_to).alias(
            "log_or_hi"
        ),
    )


def gate_confusion_metrics_sql(
    table: str,
    gate_truth_sql: str,
    gate_pred_sql: str,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`gate_confusion_metrics`."""
    t = f"CAST({gate_truth_sql} AS INTEGER)"
    p = f"CAST({gate_pred_sql} AS INTEGER)"
    return f"""
    WITH agg AS (
      SELECT CAST(SUM({t} * {p}) AS BIGINT) AS n11,
             CAST(SUM({t} * (1 - {p})) AS BIGINT) AS n10,
             CAST(SUM((1 - {t}) * {p}) AS BIGINT) AS n01,
             CAST(SUM((1 - {t}) * (1 - {p})) AS BIGINT) AS n00
      FROM {table}
    ),
    c AS (
      SELECT n11, n10, n01, n00,
             CAST(n11 AS DOUBLE) AS a, CAST(n10 AS DOUBLE) AS b,
             CAST(n01 AS DOUBLE) AS c, CAST(n00 AS DOUBLE) AS d,
             n11 > 0 AND n10 > 0 AND n01 > 0 AND n00 > 0 AS all_pos
      FROM agg
    )
    SELECT n11, n10, n01, n00,
           ROUND(CASE WHEN SQRT((a + b) * (a + c) * (d + b) * (d + c)) > 0
                 THEN (a * d - b * c)
                      / SQRT((a + b) * (a + c) * (d + b) * (d + c)) END,
                 {round_to}) AS mcc,
           ROUND((CASE WHEN a + b > 0 THEN a / (a + b) END)
                 + (CASE WHEN d + c > 0 THEN d / (d + c) END) - 1.0,
                 {round_to}) AS youden_j,
           ROUND(CASE WHEN 2.0 * a + b + c > 0
                 THEN 2.0 * a / (2.0 * a + b + c) END,
                 {round_to}) AS f1,
           ROUND(CASE WHEN all_pos THEN (a * d) / (b * c) END,
                 {round_to}) AS odds_ratio,
           ROUND(CASE WHEN all_pos THEN LN((a * d) / (b * c))
                 - 1.96 * SQRT(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) END,
                 {round_to}) AS log_or_lo,
           ROUND(CASE WHEN all_pos THEN LN((a * d) / (b * c))
                 + 1.96 * SQRT(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) END,
                 {round_to}) AS log_or_hi
    FROM c
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 89: average precision (the PR-curve area, rank form)
# ──────────────────────────────────────────────────────────────────────────


def average_precision(
    df: DataFrame,
    qid_col: str = "qid",
    score_col: str = "score",
    rel_col: str = "rel",
    tie_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Average precision per query over (qid, score, binary rel)
    candidates: ``AP = Σ_k rel_k · P@k / n_relevant`` with P@k the
    precision at each relevant hit — the area under the PR curve in
    its rank form, the metric MRR under-counts (MRR sees only the
    first hit) and NDCG grades differently (log discount vs precision
    weighting).

    Unlike NDCG's gain sums, AP IS tie-order sensitive, so the rank
    window orders by (score DESC, ``tie_col`` ASC) — a total order
    both engines share. One shuffle on qid; the running-relevant count
    and the final rollup ride the same window partitioning. Output:
    (qid, n_candidates, n_relevant, ap), ap = 0.0 for queries with no
    relevant candidate (conventional, not NULL)."""
    w = Window.partitionBy(qid_col).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    ranked = df.select(
        F.col(qid_col).alias("qid"),
        F.col(rel_col).cast("int").alias("__rel"),
        F.row_number().over(w).alias("__r"),
        F.sum(F.col(rel_col).cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum"),
    )
    agg = ranked.groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("__rel").cast("bigint").alias("n_relevant"),
        F.sum(
            F.col("__rel").cast("double")
            * F.col("__cum").cast("double")
            / F.col("__r").cast("double")
        ).alias("__ap_num"),
    )
    ap = F.when(
        F.col("n_relevant") > 0,
        F.col("__ap_num") / F.col("n_relevant").cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "qid",
        "n_candidates",
        "n_relevant",
        F.round(ap, round_to).alias("ap"),
    ).orderBy("qid")


def average_precision_sql(
    cands_sql: str,
    qid_col: str = "qid",
    score_col: str = "score",
    rel_col: str = "rel",
    tie_col: str = "doc_id",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`average_precision`. ``cands_sql`` must
    yield (qid, score, rel, tie) columns."""
    return f"""
    WITH cands AS ({cands_sql}),
    ranked AS (
      SELECT {qid_col} AS qid,
             CAST({rel_col} AS INTEGER) AS rel,
             ROW_NUMBER() OVER (PARTITION BY {qid_col}
                                ORDER BY {score_col} DESC,
                                         {tie_col} ASC) AS r,
             SUM(CAST({rel_col} AS INTEGER))
               OVER (PARTITION BY {qid_col}
                     ORDER BY {score_col} DESC, {tie_col} ASC
                     ROWS UNBOUNDED PRECEDING) AS cum
      FROM cands
    ),
    agg AS (
      SELECT qid,
             CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(rel) AS BIGINT) AS n_relevant,
             SUM(CAST(rel AS DOUBLE) * CAST(cum AS DOUBLE)
                 / CAST(r AS DOUBLE)) AS ap_num
      FROM ranked GROUP BY qid
    )
    SELECT qid, n_candidates, n_relevant,
           ROUND(CASE WHEN n_relevant > 0
                      THEN ap_num / CAST(n_relevant AS DOUBLE)
                      ELSE 0.0 END, {round_to}) AS ap
    FROM agg ORDER BY qid
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 90: Wasserstein-1 distribution drift (CDF-integral form)
# ──────────────────────────────────────────────────────────────────────────


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Earth-mover (Wasserstein-1) distance between the ``value_col``
    distributions of two groups, in the CDF-integral form
    ``W1 = ∫ |F_a(v) - F_b(v)| dv`` evaluated exactly on the merged
    empirical support: one rollup to distinct values with per-group
    counts, a running-sum window for the two CDFs, and
    ``Σ |F_a - F_b| · (next_v - v)`` over consecutive support points.
    Unlike KS (sup metric, location-blind magnitude) or PSI/Hellinger
    (bin-dependent), W1 reads in the VALUE's own units — "the
    distributions differ by this many characters/dollars on average".

    Handles unequal group sizes exactly (CDFs normalize per group).
    The global-order window runs over DISTINCT values — use a column
    with bounded support (integer lengths, bucketed prices); for
    continuous uniques at 100-TB scale, discretize first or estimate
    from KLL quantiles (operators/sketches.py). Output (one row):
    n_a, n_b, n_support, w1."""
    pts = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    per_val = pts.groupBy("__v").agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("__ca"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0))
        .cast("bigint")
        .alias("__cb"),
    )
    w = Window.orderBy("__v")
    tot = per_val.agg(
        F.sum("__ca").alias("na"), F.sum("__cb").alias("nb")
    )
    cum = per_val.select(
        "__v",
        F.sum("__ca")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cuma"),
        F.sum("__cb")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cumb"),
        F.lead("__v").over(w).alias("__nextv"),
    ).crossJoin(F.broadcast(tot))
    seg = cum.filter(F.col("__nextv").isNotNull()).select(
        (
            F.abs(
                F.col("__cuma").cast("double") / F.col("na").cast("double")
                - F.col("__cumb").cast("double") / F.col("nb").cast("double")
            )
            * (F.col("__nextv") - F.col("__v"))
        ).alias("__seg"),
        "na",
        "nb",
    )
    return seg.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_support"),
        F.round(F.coalesce(F.sum("__seg"), F.lit(0.0)), round_to).alias(
            "w1"
        ),
    )


def wasserstein_1d_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`wasserstein_1d`."""
    return f"""
    WITH pts AS (
      SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v
      FROM {table}
      WHERE {group_col} IN ('{group_a}', '{group_b}')
    ),
    per_val AS (
      SELECT v,
             CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN g = '{group_b}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM pts GROUP BY v
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM per_val),
    cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb,
             LEAD(v) OVER (ORDER BY v) AS nextv
      FROM per_val
    ),
    seg AS (
      SELECT ABS(CAST(cuma AS DOUBLE) / CAST(tot.na AS DOUBLE)
                 - CAST(cumb AS DOUBLE) / CAST(tot.nb AS DOUBLE))
             * (nextv - v) AS seg,
             tot.na AS na, tot.nb AS nb
      FROM cum CROSS JOIN tot
      WHERE nextv IS NOT NULL
    )
    SELECT CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_support,
           ROUND(COALESCE(SUM(seg), 0.0), {round_to}) AS w1
    FROM seg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 93: Qini uplift deciles
# ──────────────────────────────────────────────────────────────────────────


def qini_uplift_deciles(
    units: DataFrame,
    treat_col: str = "t",
    outcome_col: str = "y",
    score_col: str = "score",
    tie_col: str = "unit_id",
    n_buckets: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Qini/uplift decile table over scored units: rank by the uplift
    score (DESC, ``tie_col`` tie-break), split into ``n_buckets``
    equal-frequency buckets, and report per bucket the CUMULATIVE
    treated/control counts and conversions plus the two standard
    curves —

      uplift_at_k = conv_t/n_t − conv_c/n_c           (rate gap)
      qini_at_k   = conv_t − conv_c · n_t/n_c         (absolute scale)

    the targeting read-out behind every uplift model: if the score
    works, early deciles carry most of the incremental conversions.
    NTILE over the total order is deterministic in both engines; the
    cumulative pass is a second window over the 10-row rollup. Output
    per bucket: (bucket, n_treat, n_control, conv_treat, conv_control,
    uplift_at_k, qini_at_k)."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(tie_col).asc())
    bucketed = units.select(
        F.ntile(n_buckets).over(w).cast("bigint").alias("bucket"),
        F.col(treat_col).cast("int").alias("__t"),
        F.col(outcome_col).cast("int").alias("__y"),
    )
    per = bucketed.groupBy("bucket").agg(
        F.sum("__t").cast("bigint").alias("__bt"),
        F.sum(F.lit(1) - F.col("__t")).cast("bigint").alias("__bc"),
        F.sum(F.col("__t") * F.col("__y")).cast("bigint").alias("__byt"),
        F.sum((F.lit(1) - F.col("__t")) * F.col("__y"))
        .cast("bigint")
        .alias("__byc"),
    )
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "bucket",
        F.sum("__bt").over(wc).alias("n_treat"),
        F.sum("__bc").over(wc).alias("n_control"),
        F.sum("__byt").over(wc).alias("conv_treat"),
        F.sum("__byc").over(wc).alias("conv_control"),
    )
    nt = F.col("n_treat").cast("double")
    nc = F.col("n_control").cast("double")
    uplift = F.col("conv_treat").cast("double") / nt - F.col(
        "conv_control"
    ).cast("double") / nc
    qini = F.col("conv_treat").cast("double") - F.col(
        "conv_control"
    ).cast("double") * nt / nc
    return cum.select(
        "bucket",
        "n_treat",
        "n_control",
        "conv_treat",
        "conv_control",
        F.round(uplift, round_to).alias("uplift_at_k"),
        F.round(qini, round_to).alias("qini_at_k"),
    ).orderBy("bucket")


def qini_uplift_deciles_sql(
    units_sql: str,
    treat_col: str = "t",
    outcome_col: str = "y",
    score_col: str = "score",
    tie_col: str = "unit_id",
    n_buckets: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`qini_uplift_deciles`. ``units_sql`` must
    yield (tie, treat, outcome, score) columns."""
    return f"""
    WITH units AS ({units_sql}),
    bucketed AS (
      SELECT NTILE({n_buckets}) OVER (ORDER BY {score_col} DESC,
                                      {tie_col} ASC) AS bucket,
             CAST({treat_col} AS INTEGER) AS t,
             CAST({outcome_col} AS INTEGER) AS y
      FROM units
    ),
    per AS (
      SELECT bucket,
             CAST(SUM(t) AS BIGINT) AS bt,
             CAST(SUM(1 - t) AS BIGINT) AS bc,
             CAST(SUM(t * y) AS BIGINT) AS byt,
             CAST(SUM((1 - t) * y) AS BIGINT) AS byc
      FROM bucketed GROUP BY bucket
    ),
    cum AS (
      SELECT bucket,
             CAST(SUM(bt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS n_treat,
             CAST(SUM(bc) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS n_control,
             CAST(SUM(byt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS conv_treat,
             CAST(SUM(byc) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS conv_control
      FROM per
    )
    SELECT bucket, n_treat, n_control, conv_treat, conv_control,
           ROUND(CAST(conv_treat AS DOUBLE) / CAST(n_treat AS DOUBLE)
                 - CAST(conv_control AS DOUBLE)
                   / CAST(n_control AS DOUBLE), {round_to})
             AS uplift_at_k,
           ROUND(CAST(conv_treat AS DOUBLE)
                 - CAST(conv_control AS DOUBLE)
                   * CAST(n_treat AS DOUBLE) / CAST(n_control AS DOUBLE),
                 {round_to}) AS qini_at_k
    FROM cum ORDER BY bucket
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 94: Goodman-Kruskal lambda (proportional reduction in error)
# ──────────────────────────────────────────────────────────────────────────


def gk_lambda(
    df: DataFrame,
    a_col: str,
    b_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Goodman-Kruskal λ for a pair of categoricals: the proportional
    reduction in prediction ERROR — λ_{B|A} = (Σ_a max_b n_ab − max_b
    n_b) / (n − max_b n_b), i.e. how much knowing A shrinks the
    misclassification rate of guessing B's mode. The PRE complement to
    the suite's chi²/Cramér's V/Theil's U family: V measures
    association strength, U information shared, λ answers the modeling
    question directly ("does this feature improve a majority-class
    baseline at all?") and is exactly 0 when A never changes B's
    modal guess — a sharper null than V's.

    Exact integer cell counts; three tiny aggregates over the
    contingency rollup. Output (one row): n, lambda_b_given_a,
    lambda_a_given_b, lambda_symmetric (Goodman-Kruskal's averaged
    form)."""
    cells = df.groupBy(
        F.col(a_col).alias("__a"), F.col(b_col).alias("__b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    row_max = cells.groupBy("__a").agg(F.max("__n").alias("__m"))
    col_max = cells.groupBy("__b").agg(F.max("__n").alias("__m"))
    marg_b = (
        cells.groupBy("__b")
        .agg(F.sum("__n").alias("__nb"))
        .agg(F.max("__nb").cast("bigint").alias("max_b"))
    )
    marg_a = (
        cells.groupBy("__a")
        .agg(F.sum("__n").alias("__na"))
        .agg(F.max("__na").cast("bigint").alias("max_a"))
    )
    sums = (
        cells.agg(F.sum("__n").cast("bigint").alias("n"))
        .crossJoin(
            F.broadcast(
                row_max.agg(F.sum("__m").cast("bigint").alias("sum_row_max"))
            )
        )
        .crossJoin(
            F.broadcast(
                col_max.agg(F.sum("__m").cast("bigint").alias("sum_col_max"))
            )
        )
        .crossJoin(F.broadcast(marg_b))
        .crossJoin(F.broadcast(marg_a))
    )
    nn = F.col("n").cast("double")
    l_ba = (F.col("sum_row_max") - F.col("max_b")).cast("double") / (
        nn - F.col("max_b").cast("double")
    )
    l_ab = (F.col("sum_col_max") - F.col("max_a")).cast("double") / (
        nn - F.col("max_a").cast("double")
    )
    l_sym = (
        (
            F.col("sum_row_max")
            + F.col("sum_col_max")
            - F.col("max_b")
            - F.col("max_a")
        ).cast("double")
        / (F.lit(2.0) * nn - F.col("max_b").cast("double") - F.col("max_a").cast("double"))
    )
    return sums.select(
        "n",
        F.round(l_ba, round_to).alias("lambda_b_given_a"),
        F.round(l_ab, round_to).alias("lambda_a_given_b"),
        F.round(l_sym, round_to).alias("lambda_symmetric"),
    )


def gk_lambda_sql(
    table: str, a_col: str, b_col: str, round_to: int = 6
) -> str:
    """DuckDB twin of :func:`gk_lambda`."""
    return f"""
    WITH cells AS (
      SELECT {a_col} AS a, {b_col} AS b, CAST(COUNT(*) AS BIGINT) AS n
      FROM {table} GROUP BY 1, 2
    ),
    sums AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n,
             CAST((SELECT SUM(m) FROM (SELECT MAX(n) AS m FROM cells
                                       GROUP BY a)) AS BIGINT)
               AS sum_row_max,
             CAST((SELECT SUM(m) FROM (SELECT MAX(n) AS m FROM cells
                                       GROUP BY b)) AS BIGINT)
               AS sum_col_max,
             CAST((SELECT MAX(nb) FROM (SELECT SUM(n) AS nb FROM cells
                                        GROUP BY b)) AS BIGINT) AS max_b,
             CAST((SELECT MAX(na) FROM (SELECT SUM(n) AS na FROM cells
                                        GROUP BY a)) AS BIGINT) AS max_a
      FROM cells
    )
    SELECT n,
           ROUND(CAST(sum_row_max - max_b AS DOUBLE)
                 / (CAST(n AS DOUBLE) - CAST(max_b AS DOUBLE)),
                 {round_to}) AS lambda_b_given_a,
           ROUND(CAST(sum_col_max - max_a AS DOUBLE)
                 / (CAST(n AS DOUBLE) - CAST(max_a AS DOUBLE)),
                 {round_to}) AS lambda_a_given_b,
           ROUND(CAST(sum_row_max + sum_col_max - max_b - max_a AS DOUBLE)
                 / (2.0 * CAST(n AS DOUBLE) - CAST(max_b AS DOUBLE)
                    - CAST(max_a AS DOUBLE)), {round_to})
             AS lambda_symmetric
    FROM sums
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 96: multi-rater agreement — Fleiss' κ + Krippendorff's α
# ──────────────────────────────────────────────────────────────────────────


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    ratings: list[Column],
    round_to: int = 6,
) -> DataFrame:
    """Fleiss' κ: chance-corrected agreement among m ≥ 2 raters
    assigning each item to one of k categories — the multi-rater
    generalization of Cohen's κ (cohens_kappa above handles exactly
    two). Each entry of ``ratings`` is a string-typed Column (one
    rater's verdict per row); ratings must be COMPLETE (no NULLs) —
    the formula assumes a constant m per item (krippendorff_alpha
    below is the missing-data-tolerant sibling).

    With n_ij = raters putting item i in category j:
    P_i = (Σ_j n_ij² − m)/(m(m−1)), P̄ = mean_i P_i,
    p_j = Σ_i n_ij/(N·m), P̄_e = Σ_j p_j², κ = (P̄−P̄_e)/(1−P̄_e).
    Everything is exact integer aggregation (melt → two tiny
    rollups); one double division at the end. Output (one row):
    n_items, n_raters, p_bar, p_e, kappa."""
    m = len(ratings)
    long = None
    for r in ratings:
        part = df.select(
            F.col(item_col).alias("__item"), r.cast("string").alias("__c")
        )
        long = part if long is None else long.unionByName(part)
    nij = long.groupBy("__item", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    per_item = nij.groupBy("__item").agg(
        F.sum(F.col("__n") * F.col("__n")).alias("__s2")
    )
    items = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("__s2").cast("bigint").alias("t_s2"),
    )
    cats = (
        nij.groupBy("__c")
        .agg(F.sum("__n").alias("__nc"))
        .agg(F.sum(F.col("__nc") * F.col("__nc")).cast("bigint").alias("t_c2"))
    )
    g = items.crossJoin(F.broadcast(cats))
    nm = F.col("n_items").cast("double") * F.lit(float(m))
    p_bar = (F.col("t_s2").cast("double") - nm) / (
        nm * F.lit(float(m - 1))
    )
    p_e = F.col("t_c2").cast("double") / (nm * nm)
    kappa = (p_bar - p_e) / (F.lit(1.0) - p_e)
    return g.select(
        "n_items",
        F.lit(m).cast("int").alias("n_raters"),
        F.round(p_bar, round_to).alias("p_bar"),
        F.round(p_e, round_to).alias("p_e"),
        F.round(kappa, round_to).alias("kappa"),
    )


def fleiss_kappa_sql(
    table: str,
    item_col: str,
    rating_sqls: list[str],
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`fleiss_kappa`. Each entry of
    ``rating_sqls`` is a SQL expression over ``table`` yielding one
    rater's string verdict."""
    m = len(rating_sqls)
    melt = "\n      UNION ALL ".join(
        f"SELECT {item_col} AS item, CAST({r} AS VARCHAR) AS c FROM {table}"
        for r in rating_sqls
    )
    return f"""
    WITH long AS (
      {melt}
    ),
    nij AS (
      SELECT item, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM long GROUP BY item, c
    ),
    items AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(s2) AS BIGINT) AS t_s2
      FROM (SELECT item, SUM(n * n) AS s2 FROM nij GROUP BY item)
    ),
    cats AS (
      SELECT CAST(SUM(nc * nc) AS BIGINT) AS t_c2
      FROM (SELECT c, SUM(n) AS nc FROM nij GROUP BY c)
    )
    SELECT n_items,
           CAST({m} AS INT) AS n_raters,
           ROUND((CAST(t_s2 AS DOUBLE)
                  - CAST(n_items AS DOUBLE) * {float(m)})
                 / (CAST(n_items AS DOUBLE) * {float(m)} * {float(m - 1)}),
                 {round_to}) AS p_bar,
           ROUND(CAST(t_c2 AS DOUBLE)
                 / ((CAST(n_items AS DOUBLE) * {float(m)})
                    * (CAST(n_items AS DOUBLE) * {float(m)})),
                 {round_to}) AS p_e,
           ROUND(((CAST(t_s2 AS DOUBLE)
                   - CAST(n_items AS DOUBLE) * {float(m)})
                  / (CAST(n_items AS DOUBLE) * {float(m)} * {float(m - 1)})
                  - CAST(t_c2 AS DOUBLE)
                    / ((CAST(n_items AS DOUBLE) * {float(m)})
                       * (CAST(n_items AS DOUBLE) * {float(m)})))
                 / (1.0 - CAST(t_c2 AS DOUBLE)
                          / ((CAST(n_items AS DOUBLE) * {float(m)})
                             * (CAST(n_items AS DOUBLE) * {float(m)}))),
                 {round_to}) AS kappa
    FROM items CROSS JOIN cats
    """


def krippendorff_alpha_nominal(
    df: DataFrame,
    item_col: str,
    ratings: list[Column],
    round_to: int = 6,
) -> DataFrame:
    """Krippendorff's α for nominal data — the agreement coefficient
    that tolerates MISSING ratings (its whole reason to exist over
    Fleiss' κ): NULL verdicts are dropped in the melt, each item
    keeps its own rating count m_i, and items with m_i < 2 are
    excluded (they carry no pairable information).

    Coincidence form, all-integer until the last division: per item
    the disagreeing-pair mass is (m_i² − Σ_c n_ic²)/(m_i − 1); with
    n = Σ m_i and category totals n_c over the included items,
    α = 1 − (n−1)·Σ_i[(m_i² − Σn_ic²)/(m_i−1)] / (n² − Σ_c n_c²).
    Output (one row): n_items, n_ratings, alpha."""
    long = None
    for r in ratings:
        part = df.select(
            F.col(item_col).alias("__item"), r.cast("string").alias("__c")
        )
        long = part if long is None else long.unionByName(part)
    long = long.filter(F.col("__c").isNotNull())
    nij = long.groupBy("__item", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    per_item = (
        nij.groupBy("__item")
        .agg(
            F.sum("__n").cast("bigint").alias("__m"),
            F.sum(F.col("__n") * F.col("__n")).cast("bigint").alias("__s2"),
        )
        .filter(F.col("__m") >= 2)
    )
    items = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("__m").cast("bigint").alias("n_ratings"),
        F.sum(
            (
                F.col("__m") * F.col("__m") - F.col("__s2")
            ).cast("double")
            / (F.col("__m") - 1).cast("double")
        ).alias("d_num"),
    )
    cats = (
        nij.join(per_item.select("__item"), "__item")
        .groupBy("__c")
        .agg(F.sum("__n").alias("__nc"))
        .agg(F.sum(F.col("__nc") * F.col("__nc")).cast("bigint").alias("t_c2"))
    )
    g = items.crossJoin(F.broadcast(cats))
    n = F.col("n_ratings").cast("double")
    alpha = F.lit(1.0) - (n - F.lit(1.0)) * F.col("d_num") / (
        n * n - F.col("t_c2").cast("double")
    )
    return g.select(
        "n_items",
        "n_ratings",
        F.round(alpha, round_to).alias("alpha"),
    )


def krippendorff_alpha_nominal_sql(
    table: str,
    item_col: str,
    rating_sqls: list[str],
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`krippendorff_alpha_nominal`."""
    melt = "\n      UNION ALL ".join(
        f"SELECT {item_col} AS item, CAST({r} AS VARCHAR) AS c FROM {table}"
        for r in rating_sqls
    )
    return f"""
    WITH long AS (
      SELECT * FROM (
      {melt}
      ) WHERE c IS NOT NULL
    ),
    nij AS (
      SELECT item, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM long GROUP BY item, c
    ),
    per_item AS (
      SELECT item, CAST(SUM(n) AS BIGINT) AS m,
             CAST(SUM(n * n) AS BIGINT) AS s2
      FROM nij GROUP BY item
      HAVING SUM(n) >= 2
    ),
    items AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(m) AS BIGINT) AS n_ratings,
             SUM(CAST(m * m - s2 AS DOUBLE) / CAST(m - 1 AS DOUBLE))
               AS d_num
      FROM per_item
    ),
    cats AS (
      SELECT CAST(SUM(nc * nc) AS BIGINT) AS t_c2
      FROM (SELECT c, SUM(n) AS nc
            FROM nij JOIN per_item USING (item) GROUP BY c)
    )
    SELECT n_items, n_ratings,
           ROUND(1.0 - (CAST(n_ratings AS DOUBLE) - 1.0) * d_num
                       / (CAST(n_ratings AS DOUBLE)
                          * CAST(n_ratings AS DOUBLE)
                          - CAST(t_c2 AS DOUBLE)),
                 {round_to}) AS alpha
    FROM items CROSS JOIN cats
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 101: cascade + rank-biased retrieval metrics — ERR@k and RBP
# ──────────────────────────────────────────────────────────────────────────


def err_rbp(
    candidates: DataFrame,
    k: int = 10,
    g_cap: int = 4,
    persistence: float = 0.8,
    round_to: int = 6,
) -> DataFrame:
    """Expected Reciprocal Rank (Chapelle 2009 cascade model) and
    Rank-Biased Precision (Moffat & Zobel 2008) per query — the two
    user-model metrics the suite's NDCG/MRR/AP trio doesn't cover:
    ERR models a user who STOPS at the first satisfying result
    (diminishing credit after strong hits, which NDCG's additive
    gains ignore); RBP models a user who scans downward with
    persistence p (geometric attention, no hard cutoff).

    Input: (qid, doc_id, score, rel) rows; ranking is the (score
    DESC, doc_id ASC) total order so both engines walk identical
    permutations. Grades cap at ``g_cap`` (TREC convention), giving
    stop probability R = (2^g − 1)/2^g_cap ∈ (0, 1) for g ≥ 1 — the
    cascade survival product is exp(Σ ln(1−R)) over the strict rank
    prefix, never a log of zero. RBP uses binary relevance rel ≥ 2
    over the full candidate ranking: (1−p)·Σ rel_bin·p^(r−1).
    Output per query: (qid, n_cands, err_at_k, rbp)."""
    w_rank = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    ranked = candidates.select(
        "qid",
        "doc_id",
        "rel",
        F.row_number().over(w_rank).alias("__r"),
    ).select(
        "qid",
        "__r",
        (
            (
                F.pow(
                    F.lit(2.0),
                    F.least(F.col("rel").cast("double"), F.lit(float(g_cap))),
                )
                - F.lit(1.0)
            )
            / F.lit(float(2**g_cap))
        ).alias("__stopp"),
        F.when(F.col("rel") >= 2, 1.0).otherwise(0.0).alias("__relbin"),
    )
    w_prefix = (
        Window.partitionBy("qid")
        .orderBy("__r")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stepped = ranked.select(
        "qid",
        "__r",
        "__stopp",
        "__relbin",
        F.exp(
            F.coalesce(
                F.sum(F.log(F.lit(1.0) - F.col("__stopp"))).over(w_prefix),
                F.lit(0.0),
            )
        ).alias("__surv"),
    )
    return (
        stepped.groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cands"),
            F.sum(
                F.when(
                    F.col("__r") <= k,
                    F.col("__stopp")
                    * F.col("__surv")
                    / F.col("__r").cast("double"),
                ).otherwise(0.0)
            ).alias("__err"),
            F.sum(
                F.col("__relbin")
                * F.pow(
                    F.lit(persistence), F.col("__r").cast("double") - 1.0
                )
            ).alias("__rbpsum"),
        )
        .select(
            "qid",
            "n_cands",
            F.round(F.col("__err"), round_to).alias("err_at_k"),
            F.round(
                F.lit(1.0 - persistence) * F.col("__rbpsum"), round_to
            ).alias("rbp"),
        )
        .orderBy("qid")
    )


def err_rbp_sql(
    candidates_sql: str,
    k: int = 10,
    g_cap: int = 4,
    persistence: float = 0.8,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`err_rbp`. ``candidates_sql`` must yield
    (qid, doc_id, score, rel)."""
    return f"""
    WITH cands AS ({candidates_sql}),
    ranked AS (
      SELECT qid,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS r,
             (POWER(2.0, LEAST(CAST(rel AS DOUBLE), {float(g_cap)!r}))
              - 1.0) / {float(2**g_cap)!r} AS bigr,
             CASE WHEN rel >= 2 THEN 1.0 ELSE 0.0 END AS relbin
      FROM cands
    ),
    stepped AS (
      SELECT qid, r, bigr, relbin,
             EXP(COALESCE(SUM(LN(1.0 - bigr))
                            OVER (PARTITION BY qid ORDER BY r
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING),
                          0.0)) AS surv
      FROM ranked
    )
    SELECT qid,
           CAST(COUNT(*) AS BIGINT) AS n_cands,
           ROUND(SUM(CASE WHEN r <= {k}
                          THEN bigr * surv / CAST(r AS DOUBLE)
                          ELSE 0.0 END), {round_to}) AS err_at_k,
           ROUND({1.0 - persistence!r}
                 * SUM(relbin * POWER({persistence!r},
                                      CAST(r AS DOUBLE) - 1.0)),
                 {round_to}) AS rbp
    FROM stepped GROUP BY qid ORDER BY qid
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 106: Brunner-Munzel + Fligner-Killeen
# ──────────────────────────────────────────────────────────────────────────
from .probability import inv_phi, inv_phi_sql  # noqa: E402


def brunner_munzel(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Brunner-Munzel (2000) generalized Wilcoxon test: tests
    P(X < Y) + ½P(X = Y) = ½ WITHOUT Mann-Whitney's hidden
    equal-variance-of-ranks assumption — the two-sample test of
    record when the groups' spreads differ (Behrens-Fisher in rank
    space). Same doubled-rank exactness discipline as mann_whitney_u:
    for a distinct value with ``c_prev`` combined observations below
    and ``c`` ties (``ca``/``ca_prev`` within-group), the doubled
    combined and within mid-ranks are integers, so the per-
    observation deviation 2d = 2(c_prev − ca_prev) + (c − ca) is an
    integer CONSTANT across that value's group members — rank
    variances come from exact bigint (Σ2d, Σ(2d)²) power sums and the
    closing statistic

      W = n_a·n_b·(R̄_b − R̄_a) / ((n_a+n_b)·√(n_a·S_a² + n_b·S_b²))

    is one double expression. Ranks are computed on the aggregated
    value-count table, never per row. Output (one row): n_a, n_b,
    p_hat (= P̂(X<Y)+½P̂(X=Y)), bm_stat."""
    x = F.col(value_col).cast("decimal(18,2)")
    two = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"), x.alias("__x")
    )
    counts = two.groupBy("__x").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("__ca"),
    )
    w = Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = (
        counts.withColumn(
            "__cprev", F.coalesce(F.sum("__c").over(w), F.lit(0))
        )
        .withColumn(
            "__caprev", F.coalesce(F.sum("__ca").over(w), F.lit(0))
        )
        .withColumn(
            "__cbprev", F.col("__cprev") - F.col("__caprev")
        )
        .withColumn("__cb", F.col("__c") - F.col("__ca"))
    )
    # doubled combined mid-rank and doubled within-group deviations
    r2 = 2 * F.col("__cprev") + F.col("__c") + 1
    d2a = 2 * (F.col("__cprev") - F.col("__caprev")) + (
        F.col("__c") - F.col("__ca")
    )
    d2b = 2 * (F.col("__cprev") - F.col("__cbprev")) + (
        F.col("__c") - F.col("__cb")
    )
    agg = ranked.agg(
        F.sum("__ca").cast("bigint").alias("n_a"),
        F.sum("__cb").cast("bigint").alias("n_b"),
        F.sum(F.col("__ca") * r2).cast("bigint").alias("r2a"),
        F.sum(F.col("__cb") * r2).cast("bigint").alias("r2b"),
        F.sum(F.col("__ca") * d2a).cast("bigint").alias("sda"),
        F.sum(F.col("__ca") * d2a * d2a).cast("bigint").alias("sdda"),
        F.sum(F.col("__cb") * d2b).cast("bigint").alias("sdb"),
        F.sum(F.col("__cb") * d2b * d2b).cast("bigint").alias("sddb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    rbar_a = F.col("r2a").cast("double") / (2.0 * na)
    rbar_b = F.col("r2b").cast("double") / (2.0 * nb)
    s2a = (
        F.col("sdda").cast("double")
        - F.col("sda").cast("double") * F.col("sda").cast("double") / na
    ) / (4.0 * (na - 1.0))
    s2b = (
        F.col("sddb").cast("double")
        - F.col("sdb").cast("double") * F.col("sdb").cast("double") / nb
    ) / (4.0 * (nb - 1.0))
    bm = (
        na
        * nb
        * (rbar_b - rbar_a)
        / ((na + nb) * F.sqrt(na * s2a + nb * s2b))
    )
    p_hat = (rbar_b - (nb + 1.0) / 2.0) / na
    return agg.select(
        "n_a",
        "n_b",
        F.round(p_hat, round_to).alias("p_hat"),
        F.round(bm, round_to).alias("bm_stat"),
    )


def brunner_munzel_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`brunner_munzel`."""
    return f"""
    WITH two AS (
      SELECT {group_col} AS g, CAST({value_col} AS DECIMAL(18,2)) AS x
      FROM {table} WHERE {group_col} IN ('{group_a}', '{group_b}')
    ),
    counts AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca
      FROM two GROUP BY x
    ),
    ranked AS (
      SELECT c, ca, c - ca AS cb,
             COALESCE(SUM(c) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cprev,
             COALESCE(SUM(ca) OVER (ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS caprev
      FROM counts
    ),
    agg AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
             CAST(SUM(cb) AS BIGINT) AS n_b,
             CAST(SUM(ca * (2 * cprev + c + 1)) AS BIGINT) AS r2a,
             CAST(SUM(cb * (2 * cprev + c + 1)) AS BIGINT) AS r2b,
             CAST(SUM(ca * (2 * (cprev - caprev) + (c - ca)))
                  AS BIGINT) AS sda,
             CAST(SUM(ca * (2 * (cprev - caprev) + (c - ca))
                         * (2 * (cprev - caprev) + (c - ca)))
                  AS BIGINT) AS sdda,
             CAST(SUM(cb * (2 * (cprev - (cprev - caprev))
                            + (c - (c - ca))))
                  AS BIGINT) AS sdb,
             CAST(SUM(cb * (2 * caprev + ca)
                         * (2 * caprev + ca)) AS BIGINT) AS sddb
      FROM ranked
    )
    SELECT n_a, n_b,
           ROUND((CAST(r2b AS DOUBLE) / (2.0 * CAST(n_b AS DOUBLE))
                  - (CAST(n_b AS DOUBLE) + 1.0) / 2.0)
                 / CAST(n_a AS DOUBLE), {round_to}) AS p_hat,
           ROUND(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                 * (CAST(r2b AS DOUBLE) / (2.0 * CAST(n_b AS DOUBLE))
                    - CAST(r2a AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE)))
                 / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                    * SQRT(CAST(n_a AS DOUBLE)
                           * ((CAST(sdda AS DOUBLE)
                               - CAST(sda AS DOUBLE) * CAST(sda AS DOUBLE)
                                 / CAST(n_a AS DOUBLE))
                              / (4.0 * (CAST(n_a AS DOUBLE) - 1.0)))
                           + CAST(n_b AS DOUBLE)
                             * ((CAST(sddb AS DOUBLE)
                                 - CAST(sdb AS DOUBLE) * CAST(sdb AS DOUBLE)
                                   / CAST(n_b AS DOUBLE))
                                / (4.0 * (CAST(n_b AS DOUBLE) - 1.0))))),
                 {round_to}) AS bm_stat
    FROM agg
    """


def fligner_killeen(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Fligner-Killeen test of scale homogeneity: the RANK-based
    variance-equality test — levene_brown_forsythe is robust to
    non-normality through medians but still averages raw deviations;
    FK replaces deviations with normal scores of their mid-ranks,
    a_i = Φ⁻¹(½ + r_i/(2(N+1))), making it the most outlier-resistant
    member of the family (and R's var-test default for k groups):

      FK = Σ_g n_g·(ā_g − ā)² / V,   V = Σ(a_i − ā)²/(N−1),
      FK ~ χ²(k−1) under equal scales.

    Group medians are the shared exact interpolated percentile;
    mid-ranks of |x − med_g| come from the aggregated distinct-value
    table (doubled ranks are integers); Φ⁻¹ is the same Acklam
    rational both engines already share (gaussian rank correlation).
    Output (one row): k, n, fk_stat, df."""
    pts = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__x"),
    ).filter(F.col("__x").isNotNull())
    meds = pts.groupBy("__g").agg(
        F.expr("percentile(__x, 0.5)").alias("__med")
    )
    u = pts.join(F.broadcast(meds), "__g").select(
        "__g", F.abs(F.col("__x") - F.col("__med")).alias("__u")
    )
    counts = u.groupBy("__g", "__u").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cgu")
    )
    per_u = counts.groupBy("__u").agg(
        F.sum("__cgu").cast("bigint").alias("__c")
    )
    w = Window.orderBy("__u").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_u.withColumn(
        "__cprev", F.coalesce(F.sum("__c").over(w), F.lit(0))
    )
    n_tot = per_u.agg(F.sum("__c").cast("bigint").alias("n"))
    scored = (
        counts.join(ranked.select("__u", "__c", "__cprev"), "__u")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "__g",
            "__cgu",
            "n",
            inv_phi(
                F.lit(0.5)
                + (
                    (2.0 * F.col("__cprev") + F.col("__c") + 1).cast(
                        "double"
                    )
                    / 2.0
                )
                / (2.0 * (F.col("n").cast("double") + 1.0))
            ).alias("__a"),
        )
    )
    per_g = scored.groupBy("__g").agg(
        F.max("n").alias("n"),
        F.sum("__cgu").cast("bigint").alias("__ng"),
        F.sum(F.col("__cgu") * F.col("__a")).alias("__sa"),
        F.sum(F.col("__cgu") * F.col("__a") * F.col("__a")).alias("__saa"),
    )
    g = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("n").alias("n"),
        F.sum("__ng").cast("bigint").alias("__ntot"),
        F.sum("__sa").alias("t_a"),
        F.sum("__saa").alias("t_aa"),
        F.sum(
            F.col("__sa") * F.col("__sa") / F.col("__ng").cast("double")
        ).alias("t_grp"),
    )
    nn = F.col("n").cast("double")
    abar = F.col("t_a") / nn
    v = (F.col("t_aa") - nn * abar * abar) / (nn - 1.0)
    fk = (F.col("t_grp") - nn * abar * abar) / v
    return g.select(
        "k",
        "n",
        F.round(fk, round_to).alias("fk_stat"),
        (F.col("k") - 1).cast("int").alias("df"),
    )


def fligner_killeen_sql(
    table: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`fligner_killeen`."""
    a_expr = inv_phi_sql(
        "(0.5 + ((2 * cprev + c + 1) / 2.0)"
        " / (2.0 * (CAST(n AS DOUBLE) + 1.0)))"
    )
    return f"""
    WITH pts AS (
      SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS x
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    meds AS (
      SELECT g, quantile_cont(x, 0.5) AS med FROM pts GROUP BY g
    ),
    u AS (
      SELECT p.g, ABS(p.x - m.med) AS uu
      FROM pts p JOIN meds m ON m.g = p.g
    ),
    counts AS (
      SELECT g, uu, CAST(COUNT(*) AS BIGINT) AS cgu
      FROM u GROUP BY g, uu
    ),
    per_u AS (
      SELECT uu, CAST(SUM(cgu) AS BIGINT) AS c FROM counts GROUP BY uu
    ),
    ranked AS (
      SELECT uu, c,
             COALESCE(SUM(c) OVER (ORDER BY uu
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cprev
      FROM per_u
    ),
    n_tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per_u),
    scored AS (
      SELECT co.g, co.cgu, n.n, {a_expr} AS a
      FROM counts co
      JOIN ranked r ON r.uu = co.uu
      CROSS JOIN n_tot n
    ),
    per_g AS (
      SELECT g, MAX(n) AS n, CAST(SUM(cgu) AS BIGINT) AS ng,
             SUM(cgu * a) AS sa, SUM(cgu * a * a) AS saa
      FROM scored GROUP BY g
    ),
    gg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(n) AS n,
             SUM(sa) AS t_a, SUM(saa) AS t_aa,
             SUM(sa * sa / CAST(ng AS DOUBLE)) AS t_grp
      FROM per_g
    )
    SELECT k, n,
           ROUND((t_grp - CAST(n AS DOUBLE)
                          * (t_a / CAST(n AS DOUBLE))
                          * (t_a / CAST(n AS DOUBLE)))
                 / ((t_aa - CAST(n AS DOUBLE)
                            * (t_a / CAST(n AS DOUBLE))
                            * (t_a / CAST(n AS DOUBLE)))
                    / (CAST(n AS DOUBLE) - 1.0)),
                 {round_to}) AS fk_stat,
           CAST(k - 1 AS INT) AS df
    FROM gg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 111: two-sample battery — Cramér-von Mises + BWS
# ──────────────────────────────────────────────────────────────────────────


def _w111_ranked(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Combined and within-group ranks for the two-sample rank tests
    under the (value, group) total order. Exact duplicates of
    (group, value) would make two independent ROW_NUMBER windows pair
    combined and within ranks ARBITRARILY (different shuffles,
    different pairings, different squared sums) — so ranks are built
    from the deduplicated (group, value, count) rollup instead: block
    cumsums give each tie run's starting ranks, and an exploded
    1..count sequence pairs the k-th combined rank with the k-th
    within rank, deterministically in both engines. Returns
    (g, r, i)."""
    blocks = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .groupBy(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("decimal(18,2)").alias("__x"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    w_all = Window.orderBy("__x", "__g").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_grp = (
        Window.partitionBy("__g")
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    based = blocks.select(
        "__g",
        "__cnt",
        F.coalesce(F.sum("__cnt").over(w_all), F.lit(0)).alias("__r0"),
        F.coalesce(F.sum("__cnt").over(w_grp), F.lit(0)).alias("__i0"),
    )
    return based.select(
        "__g",
        "__r0",
        "__i0",
        F.explode(F.sequence(F.lit(1), F.col("__cnt"))).alias("__k"),
    ).select(
        "__g",
        (F.col("__r0") + F.col("__k")).cast("bigint").alias("__r"),
        (F.col("__i0") + F.col("__k")).cast("bigint").alias("__i"),
    )


def cramer_von_mises_2s(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Cramér-von Mises test (Anderson 1962 rank form):
    integrates the SQUARED gap between the two empirical CDFs where
    ks_test takes only the single largest gap — CvM sees distributed
    small differences KS misses, without Kuiper's cyclic focus.

      U = n·Σ_a (r_i − i)² + m·Σ_b (r_j − j)²
      T = U/(n·m·(n+m)) − (4nm − 1)/(6(n+m))

    with r the combined rank and i/j within-group indices — U is an
    exact bigint, T one closing expression (critical values: 0.461 at
    5%, 0.743 at 1%). Ranks ride the shared (value, group) total
    order. Output (one row): n_a, n_b, u_stat, cvm_t."""
    ranked = _w111_ranked(df, group_col, value_col, group_a, group_b)
    g = ranked.agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(
            F.when(
                F.col("__g") == group_a,
                (F.col("__r") - F.col("__i")) * (F.col("__r") - F.col("__i")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ssq_a"),
        F.sum(
            F.when(
                F.col("__g") == group_b,
                (F.col("__r") - F.col("__i")) * (F.col("__r") - F.col("__i")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("ssq_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    u = F.col("n_a") * F.col("ssq_a") + F.col("n_b") * F.col("ssq_b")
    t = u.cast("double") / (na * nb * (na + nb)) - (
        F.lit(4.0) * na * nb - F.lit(1.0)
    ) / (F.lit(6.0) * (na + nb))
    return g.select(
        "n_a",
        "n_b",
        u.cast("bigint").alias("u_stat"),
        F.round(t, round_to).alias("cvm_t"),
    )


def cramer_von_mises_2s_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cramer_von_mises_2s`."""
    return f"""
    WITH blocks AS (
      SELECT {group_col} AS g, CAST({value_col} AS DECIMAL(18,2)) AS x,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table} WHERE {group_col} IN ('{group_a}', '{group_b}')
      GROUP BY 1, 2
    ),
    based AS (
      SELECT g, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY x, g
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r0,
             COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS i0
      FROM blocks
    ),
    ranked AS (
      SELECT g, CAST(r0 + k AS BIGINT) AS r, CAST(i0 + k AS BIGINT) AS i
      FROM (SELECT g, r0, i0, unnest(range(1, cnt + 1)) AS k FROM based)
    ),
    gg AS (
      SELECT CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN g = '{group_b}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN g = '{group_a}'
                           THEN (r - i) * (r - i) ELSE 0 END)
                  AS BIGINT) AS ssq_a,
             CAST(SUM(CASE WHEN g = '{group_b}'
                           THEN (r - i) * (r - i) ELSE 0 END)
                  AS BIGINT) AS ssq_b
      FROM ranked
    )
    SELECT n_a, n_b,
           CAST(n_a * ssq_a + n_b * ssq_b AS BIGINT) AS u_stat,
           ROUND(CAST(n_a * ssq_a + n_b * ssq_b AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                    * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                 - (4.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) - 1.0)
                   / (6.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))),
                 {round_to}) AS cvm_t
    FROM gg
    """


def bws_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Baumgartner-Weiß-Schindler (1998) two-sample test: the CDF-gap
    integral WEIGHTED by the inverse null variance, so the tails —
    where KS and CvM are least sensitive — count the most; the B
    statistic's null distribution is nearly sample-size-free
    (reject at 5% near B = 2.49, 1% near 3.88):

      B_x = (1/n)Σ_i (R_i − (m+n)/n·i)² /
            [ i/(n+1)·(1−i/(n+1)) · m(m+n)/n ],    B = (B_x + B_y)/2.

    Every term is a rational of exact integers (combined rank R,
    within-group index i), summed per group — one pass over the
    shared ranked rollup. Output (one row): n_a, n_b, b_x, b_y,
    bws_b."""
    ranked = _w111_ranked(df, group_col, value_col, group_a, group_b)
    w_all = Window.partitionBy()
    counts = ranked.select(
        "__g",
        "__r",
        "__i",
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0))
        .over(w_all)
        .cast("double")
        .alias("__n"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0))
        .over(w_all)
        .cast("double")
        .alias("__m"),
    )
    rr = F.col("__r").cast("double")
    ii = F.col("__i").cast("double")
    n_, m_ = F.col("__n"), F.col("__m")
    term_a = (
        (rr - (m_ + n_) / n_ * ii)
        * (rr - (m_ + n_) / n_ * ii)
        / (
            (ii / (n_ + 1.0))
            * (1.0 - ii / (n_ + 1.0))
            * (m_ * (m_ + n_) / n_)
        )
    )
    term_b = (
        (rr - (m_ + n_) / m_ * ii)
        * (rr - (m_ + n_) / m_ * ii)
        / (
            (ii / (m_ + 1.0))
            * (1.0 - ii / (m_ + 1.0))
            * (n_ * (m_ + n_) / m_)
        )
    )
    g = counts.agg(
        F.max("__n").cast("bigint").alias("n_a"),
        F.max("__m").cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("__g") == group_a, term_a)).alias("sa"),
        F.sum(F.when(F.col("__g") == group_b, term_b)).alias("sb"),
    )
    b_x = F.col("sa") / F.col("n_a").cast("double")
    b_y = F.col("sb") / F.col("n_b").cast("double")
    return g.select(
        "n_a",
        "n_b",
        F.round(b_x, round_to).alias("b_x"),
        F.round(b_y, round_to).alias("b_y"),
        F.round((b_x + b_y) / F.lit(2.0), round_to).alias("bws_b"),
    )


def bws_test_sql(
    table: str,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`bws_test`."""
    return f"""
    WITH blocks AS (
      SELECT {group_col} AS g, CAST({value_col} AS DECIMAL(18,2)) AS x,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table} WHERE {group_col} IN ('{group_a}', '{group_b}')
      GROUP BY 1, 2
    ),
    based AS (
      SELECT g, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY x, g
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r0,
             COALESCE(SUM(cnt) OVER (PARTITION BY g ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS i0
      FROM blocks
    ),
    ranked AS (
      SELECT g, CAST(r0 + k AS DOUBLE) AS r, CAST(i0 + k AS DOUBLE) AS i
      FROM (SELECT g, r0, i0, unnest(range(1, cnt + 1)) AS k FROM based)
    ),
    counts AS (
      SELECT g, r, i,
             CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END)
                  OVER () AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN g = '{group_b}' THEN 1 ELSE 0 END)
                  OVER () AS DOUBLE) AS m
      FROM ranked
    ),
    gg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n_a, CAST(MAX(m) AS BIGINT) AS n_b,
             SUM(CASE WHEN g = '{group_a}' THEN
                 (r - (m + n) / n * i) * (r - (m + n) / n * i)
                 / ((i / (n + 1.0)) * (1.0 - i / (n + 1.0))
                    * (m * (m + n) / n)) END) AS sa,
             SUM(CASE WHEN g = '{group_b}' THEN
                 (r - (m + n) / m * i) * (r - (m + n) / m * i)
                 / ((i / (m + 1.0)) * (1.0 - i / (m + 1.0))
                    * (n * (m + n) / m)) END) AS sb
      FROM counts
    )
    SELECT n_a, n_b,
           ROUND(sa / CAST(n_a AS DOUBLE), {round_to}) AS b_x,
           ROUND(sb / CAST(n_b AS DOUBLE), {round_to}) AS b_y,
           ROUND((sa / CAST(n_a AS DOUBLE) + sb / CAST(n_b AS DOUBLE))
                 / 2.0, {round_to}) AS bws_b
    FROM gg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 114: Kendall tau-b + Stuart tau-c on the contingency grid
# ──────────────────────────────────────────────────────────────────────────


def ordinal_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kendall's τ-b and Stuart's τ-c from the contingency grid —
    the two ordinal-association members somers_d's (gamma, D_yx)
    output doesn't carry: τ-b corrects the concordance gap by BOTH
    margins' ties (symmetric, but cannot reach ±1 off-square
    tables), τ-c rescales by the table shape so a perfect monotone
    relation scores ±1 on any r×c grid:

      τ-b = (C−D)/√((N₀−T_x)(N₀−T_y)),  N₀ = n(n−1)/2
      τ-c = 2m(C−D)/(n²(m−1)),          m = min(r, c).

    Same grid cross-join as somers_d (exact bigints off the TINY
    contingency rollup; the corpus scans once). Output (one row):
    n, conc, disc, tau_b, tau_c."""
    obs = (
        df.groupBy(
            F.col(x_col).cast("bigint").alias("__x"),
            F.col(y_col).cast("bigint").alias("__y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
        .localCheckpoint(eager=False)
    )
    a = obs.select(
        F.col("__x").alias("x1"), F.col("__y").alias("y1"),
        F.col("__o").alias("o1"),
    )
    b = obs.select(
        F.col("__x").alias("x2"), F.col("__y").alias("y2"),
        F.col("__o").alias("o2"),
    )
    cross = a.crossJoin(b)
    conc = cross.filter(
        (F.col("x2") > F.col("x1")) & (F.col("y2") > F.col("y1"))
    ).agg(
        F.coalesce(F.sum(F.col("o1") * F.col("o2")), F.lit(0))
        .cast("bigint")
        .alias("v")
    )
    disc = cross.filter(
        (F.col("x2") > F.col("x1")) & (F.col("y2") < F.col("y1"))
    ).agg(
        F.coalesce(F.sum(F.col("o1") * F.col("o2")), F.lit(0))
        .cast("bigint")
        .alias("v")
    )
    tx = (
        obs.groupBy("__x")
        .agg(F.sum("__o").alias("__c"))
        .agg(
            F.sum(F.col("__c") * (F.col("__c") - 1) / 2)
            .cast("bigint")
            .alias("v"),
            F.count(F.lit(1)).cast("bigint").alias("levels"),
        )
    )
    ty = (
        obs.groupBy("__y")
        .agg(F.sum("__o").alias("__c"))
        .agg(
            F.sum(F.col("__c") * (F.col("__c") - 1) / 2)
            .cast("bigint")
            .alias("v"),
            F.count(F.lit(1)).cast("bigint").alias("levels"),
        )
    )
    tot = obs.agg(F.sum("__o").cast("bigint").alias("n"))
    j = (
        tot.crossJoin(F.broadcast(conc.withColumnRenamed("v", "__conc")))
        .crossJoin(F.broadcast(disc.withColumnRenamed("v", "__disc")))
        .crossJoin(
            F.broadcast(
                tx.select(
                    F.col("v").alias("__tx"), F.col("levels").alias("__rx")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                ty.select(
                    F.col("v").alias("__ty"), F.col("levels").alias("__ry")
                )
            )
        )
    )
    c, d = F.col("__conc").cast("double"), F.col("__disc").cast("double")
    nn = F.col("n").cast("double")
    n0 = nn * (nn - 1.0) / 2.0
    tau_b = (c - d) / F.sqrt(
        (n0 - F.col("__tx").cast("double"))
        * (n0 - F.col("__ty").cast("double"))
    )
    m = F.least(F.col("__rx"), F.col("__ry")).cast("double")
    tau_c = 2.0 * m * (c - d) / (nn * nn * (m - 1.0))
    return j.select(
        "n",
        F.col("__conc").alias("conc"),
        F.col("__disc").alias("disc"),
        F.round(tau_b, round_to).alias("tau_b"),
        F.round(tau_c, round_to).alias("tau_c"),
    )


def ordinal_tau_sql(
    table: str,
    x_expr: str,
    y_expr: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ordinal_tau`."""
    return f"""
    WITH obs AS (
      SELECT CAST({x_expr} AS BIGINT) AS x, CAST({y_expr} AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM {table} GROUP BY 1, 2
    ),
    conc AS (
      SELECT CAST(COALESCE(SUM(a.o * b.o), 0) AS BIGINT) AS v
      FROM obs a JOIN obs b ON b.x > a.x AND b.y > a.y
    ),
    disc AS (
      SELECT CAST(COALESCE(SUM(a.o * b.o), 0) AS BIGINT) AS v
      FROM obs a JOIN obs b ON b.x > a.x AND b.y < a.y
    ),
    tx AS (
      SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS levels
      FROM (SELECT SUM(o) AS c FROM obs GROUP BY x)
    ),
    ty AS (
      SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS levels
      FROM (SELECT SUM(o) AS c FROM obs GROUP BY y)
    ),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
    SELECT n, conc.v AS conc, disc.v AS disc,
           ROUND((CAST(conc.v AS DOUBLE) - CAST(disc.v AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                           / 2.0 - CAST(tx.v AS DOUBLE))
                        * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                             / 2.0 - CAST(ty.v AS DOUBLE))),
                 {round_to}) AS tau_b,
           ROUND(2.0 * CAST(LEAST(tx.levels, ty.levels) AS DOUBLE)
                 * (CAST(conc.v AS DOUBLE) - CAST(disc.v AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * (CAST(LEAST(tx.levels, ty.levels) AS DOUBLE) - 1.0)),
                 {round_to}) AS tau_c
    FROM tot CROSS JOIN conc CROSS JOIN disc CROSS JOIN tx CROSS JOIN ty
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 115: heteroskedastic one-way ANOVA — Welch + Brown-Forsythe
# ──────────────────────────────────────────────────────────────────────────


def welch_anova(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Welch's heteroskedastic one-way ANOVA plus the Brown-Forsythe
    F* — the mean-equality tests that stay valid when the groups'
    variances DIFFER (anova_f assumes they don't; bartlett/levene/
    fligner in this suite exist precisely to detect when that
    assumption fails, and this is the test to run when they fire):

      Welch: F = Σw_i(x̄_i − x̄_w)²/(k−1) /
                 (1 + 2(k−2)/(k²−1)·Λ),  w_i = n_i/s_i²,
             Λ = Σ(1 − w_i/Σw)²/(n_i−1),  df2 = (k²−1)/(3Λ)
      BF:    F* = Σn_i(x̄_i − x̄)² / Σ(1 − n_i/N)·s_i²

    Everything is closed-form arithmetic over per-group DECIMAL/
    bigint moment sums — one rollup, one k-row combine. Output (one
    row): k, n, welch_f, welch_df2, bf_f."""
    pts = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("decimal(18,2)").alias("__x"),
    ).filter(F.col("__x").isNotNull())
    per_g = pts.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__x").cast("double") * F.col("__x").cast("double"))
        .alias("sxx"),
    )
    ngd = F.col("ng").cast("double")
    mean_g = F.col("sx").cast("double") / ngd
    s2_g = (F.col("sxx") - ngd * mean_g * mean_g) / (ngd - 1.0)
    w_g = ngd / s2_g
    staged = per_g.select(
        "ng",
        mean_g.alias("m"),
        s2_g.alias("s2"),
        w_g.alias("w"),
    )
    g = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("m")).alias("swm"),
        F.sum(F.col("w") * F.col("m") * F.col("m")).alias("swmm"),
        F.sum(F.col("ng").cast("double") * F.col("m")).alias("snm"),
        F.sum(
            F.col("ng").cast("double") * F.col("m") * F.col("m")
        ).alias("snmm"),
        F.sum(F.col("s2")).alias("ss2"),
        F.sum(F.col("ng").cast("double") * F.col("s2")).alias("sns2"),
        # Λ needs w/Σw per group: carry Σ over groups of
        # (1 − w/Σw)²/(ng−1) via a second pass below
    )
    # second pass for Λ (needs the total weight); k is tiny so the
    # broadcast-and-reaggregate costs one ~5-row exchange
    lam = staged.crossJoin(
        F.broadcast(g.select(F.col("sw").alias("__swt")))
    ).agg(
        F.sum(
            (F.lit(1.0) - F.col("w") / F.col("__swt"))
            * (F.lit(1.0) - F.col("w") / F.col("__swt"))
            / (F.col("ng").cast("double") - 1.0)
        ).alias("lam")
    )
    j = g.crossJoin(F.broadcast(lam))
    kk = F.col("k").cast("double")
    nn = F.col("n").cast("double")
    xw = F.col("swm") / F.col("sw")
    between_w = F.col("swmm") - F.col("sw") * xw * xw
    welch_f = (between_w / (kk - 1.0)) / (
        F.lit(1.0)
        + F.lit(2.0) * (kk - 2.0) / (kk * kk - 1.0) * F.col("lam")
    )
    welch_df2 = (kk * kk - 1.0) / (F.lit(3.0) * F.col("lam"))
    xbar = F.col("snm") / nn
    bf_num = F.col("snmm") - nn * xbar * xbar
    bf_den = F.col("ss2") - F.col("sns2") / nn
    bf_f = bf_num / bf_den
    return j.select(
        "k",
        "n",
        F.round(welch_f, round_to).alias("welch_f"),
        F.round(welch_df2, round_to).alias("welch_df2"),
        F.round(bf_f, round_to).alias("bf_f"),
    )


def welch_anova_sql(
    table: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`welch_anova`."""
    return f"""
    WITH pts AS (
      SELECT {group_col} AS g, CAST({value_col} AS DECIMAL(18,2)) AS x
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
             SUM(x) AS sx,
             SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx
      FROM pts GROUP BY g
    ),
    staged AS (
      SELECT ng,
             CAST(sx AS DOUBLE) / CAST(ng AS DOUBLE) AS m,
             (sxx - CAST(ng AS DOUBLE)
                    * (CAST(sx AS DOUBLE) / CAST(ng AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / CAST(ng AS DOUBLE)))
               / (CAST(ng AS DOUBLE) - 1.0) AS s2
      FROM per_g
    ),
    staged2 AS (
      SELECT ng, m, s2, CAST(ng AS DOUBLE) / s2 AS w FROM staged
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(ng) AS BIGINT) AS n,
             SUM(w) AS sw,
             SUM(w * m) AS swm,
             SUM(w * m * m) AS swmm,
             SUM(CAST(ng AS DOUBLE) * m) AS snm,
             SUM(CAST(ng AS DOUBLE) * m * m) AS snmm,
             SUM(s2) AS ss2,
             SUM(CAST(ng AS DOUBLE) * s2) AS sns2
      FROM staged2
    ),
    lam AS (
      SELECT SUM((1.0 - s.w / g.sw) * (1.0 - s.w / g.sw)
                 / (CAST(s.ng AS DOUBLE) - 1.0)) AS lam
      FROM staged2 s CROSS JOIN g
    )
    SELECT k, n,
           ROUND(((swmm - sw * (swm / sw) * (swm / sw))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                          / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                          * lam),
                 {round_to}) AS welch_f,
           ROUND((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                 / (3.0 * lam), {round_to}) AS welch_df2,
           ROUND((snmm - CAST(n AS DOUBLE)
                         * (snm / CAST(n AS DOUBLE))
                         * (snm / CAST(n AS DOUBLE)))
                 / (ss2 - sns2 / CAST(n AS DOUBLE)),
                 {round_to}) AS bf_f
    FROM g CROSS JOIN lam
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 137: Page's L trend test (ordered alternatives, repeated measures)
# ──────────────────────────────────────────────────────────────────────────


def page_trend_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Page's L test (Page 1963) for a MONOTONE ordered alternative
    across k treatments measured in n blocks — the directional upgrade
    over friedman_test (which only asks "any difference?") when the
    hypothesis is "values increase along the treatment order":

      ``L = Σ_j j · R_j`` (R_j = rank-sum of treatment j across
      blocks, ranks within block), with the normal approximation
      ``z = (L − n·k(k+1)²/4) / sqrt(n·k²(k+1)(k²−1)/144)``.

    Blocks missing any treatment are DROPPED (complete-block design,
    the textbook requirement). Ranks are exact integers (ties broken
    by treatment id — a total order, identical in both engines), so L
    is an exact bigint; only z passes through one sqrt. One rollup to
    (block, treatment) means, one rank window, one k-row reduction.

    Treatment ids are DENSIFIED to 1..k before the Page weights are
    applied (row_number over the k-row per-treatment rollup, ordered
    by treatment id — identical in the DuckDB twin): the L weights and
    the mu/sigma normal approximation assume consecutive 1-based
    positions, so raw ids (0-based, gapped, or scaled) would silently
    shift z_stat (ADVICE r7 #1).

    Output (one row): (n_blocks, k_treatments, l_stat, z_stat).
    """
    cell = df.groupBy(
        F.col(block_col).alias("b"), F.col(treat_col).cast("bigint").alias("t")
    ).agg(F.sum(F.col(value_col).cast("decimal(18,2)")).alias("v"))
    kk = cell.agg(F.countDistinct("t").cast("bigint").alias("k"))
    full = (
        cell.groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nt"),
            F.collect_list(F.struct("t", "v")).alias("__c"),
        )
        .crossJoin(F.broadcast(kk))
        .filter(F.col("nt") == F.col("k"))
        .select("b", F.explode("__c").alias("e"), "k")
        .select("b", F.col("e.t").alias("t"), F.col("e.v").alias("v"), "k")
    )
    w = Window.partitionBy("b").orderBy(F.col("v").asc(), F.col("t").asc())
    ranked = full.withColumn("r", F.row_number().over(w).cast("bigint"))
    per_t = ranked.groupBy("t", "k").agg(
        F.sum("r").cast("bigint").alias("rsum"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    # densify to Page positions 1..k (k-row window — trivially small)
    wj = Window.orderBy(F.col("t").asc())
    per_t = per_t.withColumn("j", F.row_number().over(wj).cast("bigint"))
    agg = per_t.agg(
        F.max("k").alias("k"),
        F.max("nb").cast("bigint").alias("n"),
        F.sum(F.col("j") * F.col("rsum")).cast("bigint").alias("l_raw"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    mu = n * k * (k + 1.0) * (k + 1.0) / 4.0
    sig = F.sqrt(
        n * k * k * (k + 1.0) * (k * k - 1.0) / 144.0
    )
    return agg.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.col("l_raw").alias("l_stat"),
        F.round(
            (F.col("l_raw").cast("double") - mu) / sig, round_to
        ).alias("z_stat"),
    )


def page_trend_test_sql(
    src_sql: str,
    block_col: str,
    treat_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`page_trend_test`."""
    return f"""
    WITH src AS ({src_sql}),
    cell AS (
      SELECT {block_col} AS b, CAST({treat_col} AS BIGINT) AS t,
             SUM(CAST({value_col} AS DECIMAL(18,2))) AS v
      FROM src GROUP BY 1, 2
    ),
    kk AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cell),
    full_blocks AS (
      SELECT b FROM cell CROSS JOIN kk
      GROUP BY b, k HAVING COUNT(*) = MAX(k)
    ),
    ranked AS (
      SELECT c.b, c.t,
             CAST(ROW_NUMBER() OVER (PARTITION BY c.b
                                     ORDER BY c.v ASC, c.t ASC)
                  AS BIGINT) AS r
      FROM cell c JOIN full_blocks USING (b)
    ),
    per_t AS (
      SELECT t, CAST(SUM(r) AS BIGINT) AS rsum,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM ranked GROUP BY t
    ),
    per_tj AS (
      SELECT rsum, nb,
             CAST(ROW_NUMBER() OVER (ORDER BY t ASC) AS BIGINT) AS j
      FROM per_t
    ),
    agg AS (
      SELECT (SELECT k FROM kk) AS k,
             CAST(MAX(nb) AS BIGINT) AS n,
             CAST(SUM(j * rsum) AS BIGINT) AS l_raw
      FROM per_tj
    )
    SELECT n AS n_blocks,
           k AS k_treatments,
           l_raw AS l_stat,
           ROUND((CAST(l_raw AS DOUBLE)
                  - CAST(n AS DOUBLE) * k * (k + 1.0) * (k + 1.0) / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * k * k * (k + 1.0)
                        * (k * k - 1.0) / 144.0), {round_to}) AS z_stat
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 140: Lepage location-scale two-sample test
# ──────────────────────────────────────────────────────────────────────────


def lepage_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Lepage (1971) combined location-scale two-sample test:
    ``D = z_W² + z_AB²`` where z_W standardizes the Wilcoxon rank-sum
    (location shift) and z_AB the Ansari-Bradley statistic (scale
    shift) — chi-square(2) under H0. mann_whitney_u sees only SHIFTS;
    a distribution that changes SPREAD at equal medians sails through
    it, and this is the standard rank test that catches both at once.

    Tie handling (r8, ADVICE r7 #2 — MID-RANKS with exact variance):
    Wilcoxon scores are mid-ranks; since a tie run [lo, lo+c-1] has
    average rank lo + (c-1)/2, the DOUBLED mid-rank ``R2 = 2*lo + c -
    1`` is an exact integer, so W accumulates as an exact bigint
    (reported as W2/2). Ansari-Bradley scores are the tie-group
    averages of the folded ranks min(r, n+1-r) — ``sa_v / c_v`` per
    distinct value from exact integer sums. Both z's use the GENERAL
    two-sample linear-rank moments (exact under ties, reduce to the
    classic closed forms without them):

      ``E[T] = m * s̄``,  ``Var[T] = m*(n-m)/(n*(n-1)) * Σ(s_i - s̄)²``

    Exactness ledger: n/nx/W2/ΣR2²/Σa are exact bigints; the doubled
    Wilcoxon SS ``ΣR2² - n(n+1)²`` is exact integer arithmetic (mean
    doubled mid-rank is exactly n+1). The only order-dependent double
    sums are the AB aggregate ``Σ m_v·sa_v/c_v`` (~1e7-1e8) and
    ``Σ sa_v²/c_v`` (~1e11) over the distinct-value rollup — their
    ulp drift reaches z_ab at relative ~1e-13, far below the 1e-6
    rounding grain, and neither big sum is itself ROUNDed or emitted.

    One global rank window, one distinct-value rollup, one k-row
    reduction. Output (one row): (n_x, n_y, w_stat, ab_mean, z_w,
    z_ab, lepage_d) — w_stat is the exact half-integer mid-rank sum
    (bit-identical: W2 is an exact bigint), while the Ansari-Bradley
    side is emitted as the MEAN score ab_mean = AB/n_x (~n/4): the
    raw sum reaches ~2e10 at sf0.1, past the 2^53/1e6 bound where
    ROUND(x,6) itself diverges cross-engine (the r8 audit caught
    exactly this column).
    """
    pts = df.select(
        F.col(group_col).cast("boolean").alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    w = Window.orderBy(F.col("__v").asc(), F.col("__g").asc())
    ranked = pts.withColumn("__r", F.row_number().over(w).cast("bigint"))
    n_row = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    perval = (
        ranked.crossJoin(F.broadcast(n_row))
        .groupBy("__v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(F.col("__g").cast("bigint")).cast("bigint").alias("m"),
            F.min("__r").alias("rmin"),
            F.sum(F.least(F.col("__r"), F.col("__n") + 1 - F.col("__r")))
            .cast("bigint")
            .alias("sa"),
        )
    )
    r2 = 2 * F.col("rmin") + F.col("c") - 1  # doubled mid-rank, exact
    # Σc·R2² ~ 4N³ wraps a non-ANSI bigint accumulator past N ~ 1.3e6
    # rows — DECIMAL(38,0) keeps it exact to N ~ 1e12 (r8 hardening;
    # per-term R2² stays bigint-safe to N ~ 1.5e9, documented bound)
    agg = perval.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("m").cast("bigint").alias("nx"),
        F.sum(F.col("m") * r2).cast("bigint").alias("w2"),
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * (r2 * r2).cast("decimal(38,0)")
        ).alias("ssr2"),
        F.sum("sa").cast("bigint").alias("sa_tot"),
        F.sum(
            F.col("m").cast("double")
            * F.col("sa").cast("double")
            / F.col("c").cast("double")
        ).alias("ab"),
        F.sum(
            F.col("sa").cast("double")
            * F.col("sa").cast("double")
            / F.col("c").cast("double")
        ).alias("sa2"),
    )
    n = F.col("n").cast("double")
    m = F.col("nx").cast("double")  # group TRUE size
    nn2 = n - m
    # doubled Wilcoxon SS: exact decimal (mean doubled mid-rank = n+1;
    # n(n+1)² itself outgrows bigint past N ~ 2e6)
    ss2_w = (
        F.col("ssr2")
        - F.col("n").cast("decimal(38,0)")
        * (F.col("n") + 1).cast("decimal(38,0)")
        * (F.col("n") + 1).cast("decimal(38,0)")
    ).cast("double")
    var_w = m * nn2 * ss2_w / (4.0 * n * (n - 1.0))
    z_w = (
        (F.col("w2") - F.col("nx") * (F.col("n") + 1)).cast("double") / 2.0
    ) / F.sqrt(var_w)
    # sa_tot ~ N²/4 so both products below outgrow int64 at sf0.1
    # already (ANSI overflow caught by the r8 bench) — go via decimal
    mu_ab = (
        F.col("nx").cast("decimal(38,0)")
        * F.col("sa_tot").cast("decimal(38,0)")
    ).cast("double") / n
    ss_ab = F.col("sa2") - (
        F.col("sa_tot").cast("decimal(38,0)")
        * F.col("sa_tot").cast("decimal(38,0)")
    ).cast("double") / n
    var_ab = m * nn2 * ss_ab / (n * (n - 1.0))
    z_ab = (F.col("ab") - mu_ab) / F.sqrt(var_ab)
    return agg.select(
        F.col("nx").alias("n_x"),
        (F.col("n") - F.col("nx")).cast("bigint").alias("n_y"),
        (F.col("w2").cast("double") / 2.0).alias("w_stat"),
        F.round(
            F.col("ab") / F.col("nx").cast("double"), round_to
        ).alias("ab_mean"),
        F.round(z_w, round_to).alias("z_w"),
        F.round(z_ab, round_to).alias("z_ab"),
        F.round(z_w * z_w + z_ab * z_ab, round_to).alias("lepage_d"),
    )


def lepage_test_sql(
    src_sql: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`lepage_test` (mid-rank form — see the
    operator docstring's exactness ledger)."""
    return f"""
    WITH src AS ({src_sql}),
    pts AS (
      SELECT ({group_col}) AS g, CAST({value_col} AS DOUBLE) AS v FROM src
    ),
    ranked AS (
      SELECT g, v,
             CAST(ROW_NUMBER() OVER (ORDER BY v ASC, g ASC) AS BIGINT)
               AS r
      FROM pts
    ),
    nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    perval AS (
      SELECT v,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS m,
             CAST(MIN(r) AS BIGINT) AS rmin,
             CAST(SUM(LEAST(r, nrow.n + 1 - r)) AS BIGINT) AS sa
      FROM ranked CROSS JOIN nrow GROUP BY v
    ),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS nx,
             CAST(SUM(m * (2 * rmin + c - 1)) AS BIGINT) AS w2,
             SUM(CAST(c AS DECIMAL(38,0))
                 * CAST((2 * rmin + c - 1) * (2 * rmin + c - 1)
                        AS DECIMAL(38,0))) AS ssr2,
             CAST(SUM(sa) AS BIGINT) AS sa_tot,
             SUM(CAST(m AS DOUBLE) * CAST(sa AS DOUBLE)
                 / CAST(c AS DOUBLE)) AS ab,
             SUM(CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                 / CAST(c AS DOUBLE)) AS sa2
      FROM perval
    ),
    z AS (
      SELECT *,
        (CAST(w2 - nx * (n + 1) AS DOUBLE) / 2.0)
          / sqrt(CAST(nx AS DOUBLE) * (CAST(n AS DOUBLE)
                 - CAST(nx AS DOUBLE))
                 * CAST(ssr2 - CAST(n AS DECIMAL(38,0))
                        * CAST(n + 1 AS DECIMAL(38,0))
                        * CAST(n + 1 AS DECIMAL(38,0)) AS DOUBLE)
                 / (4.0 * CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0))) AS z_w,
        (ab - CAST(CAST(nx AS DECIMAL(38,0)) * CAST(sa_tot AS DECIMAL(38,0))
               AS DOUBLE) / CAST(n AS DOUBLE))
          / sqrt(CAST(nx AS DOUBLE) * (CAST(n AS DOUBLE)
                 - CAST(nx AS DOUBLE))
                 * (sa2 - CAST(CAST(sa_tot AS DECIMAL(38,0))
                    * CAST(sa_tot AS DECIMAL(38,0)) AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0))) AS z_ab
      FROM agg
    )
    SELECT nx AS n_x,
           CAST(n - nx AS BIGINT) AS n_y,
           CAST(w2 AS DOUBLE) / 2.0 AS w_stat,
           ROUND(ab / CAST(nx AS DOUBLE), {round_to}) AS ab_mean,
           ROUND(z_w, {round_to}) AS z_w,
           ROUND(z_ab, {round_to}) AS z_ab,
           ROUND(z_w * z_w + z_ab * z_ab, {round_to}) AS lepage_d
    FROM z
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 146: Cucconi location-scale two-sample test
# ──────────────────────────────────────────────────────────────────────────


def cucconi_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cucconi (1968) two-sample location-scale test — the OTHER
    classical combined test (predates Lepage): based on SQUARED ranks
    from both ends,

      ``U = Σ_x S_i²``, ``V = Σ_x (N+1−S_i)²`` over sample x's ranks,
      standardized with ``E = n(N+1)(2N+1)/6``,
      ``Var = m·n(N+1)(2N+1)(8N+11)/180``, correlation
      ``ρ = 2(N²−4)/((2N+1)(8N+11)) − 1``, and
      ``C = (U*² + V*² − 2ρU*V*) / (2(1−ρ²))`` ~ exp(-C) p-value
      under H0. Squared ranks weight the tails, so C responds to
      variance changes mann_whitney misses and to shifts Ansari-
      Bradley misses — simulation literature (Marozzi 2009) finds it
      as powerful as, often more than, :func:`lepage_test`.

    Tie handling: mid-ranks (the practical variant), with the
    classical continuity moments — the bias is bounded by the tie
    density, the same caveat family as the lepage docstring. The
    mid-rank machinery keeps everything EXACT: with doubled mid-ranks
    R2 = 2·lo + c − 1 (exact ints), U4 = Σ m_v·R2² accumulates as an
    exact bigint, and the reversed-rank sum needs NO second pass —
    expanding (2(N+1) − R2)² gives

      ``V4 = 4(N+1)²·n_x − 4(N+1)·W2 + U4``

    from the same rollup's exact (n, n_x, W2, U4). The only doubles
    are the final closed forms on bit-identical integer inputs,
    identical expression shape in both engines.

    One global rank window, one distinct-value rollup, one k-row
    reduction — the lepage scale shape. Output (one row):
    (n_x, n_y, u_star, v_star, c_stat).
    """
    pts = df.select(
        F.col(group_col).cast("boolean").alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    w = Window.orderBy(F.col("__v").asc(), F.col("__g").asc())
    ranked = pts.withColumn("__r", F.row_number().over(w).cast("bigint"))
    perval = ranked.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.col("__g").cast("bigint")).cast("bigint").alias("m"),
        F.min("__r").alias("rmin"),
    )
    r2 = 2 * F.col("rmin") + F.col("c") - 1  # doubled mid-rank, exact
    # DECIMAL(38,0) accumulators: Σm·R2² ~ 4N³ wraps bigint past
    # N ~ 1.3e6 rows (r8 hardening, same as lepage/mood)
    agg = perval.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("m").cast("bigint").alias("nx"),
        F.sum(F.col("m") * r2).cast("bigint").alias("w2"),
        F.sum(
            F.col("m").cast("decimal(38,0)")
            * (r2 * r2).cast("decimal(38,0)")
        ).alias("u4"),
    )
    # V4 from the expansion — exact decimal, no second rank pass
    v4 = (
        F.lit(4).cast("decimal(38,0)")
        * (F.col("n") + 1).cast("decimal(38,0)")
        * (F.col("n") + 1).cast("decimal(38,0)")
        * F.col("nx").cast("decimal(38,0)")
        - F.lit(4).cast("decimal(38,0)")
        * (F.col("n") + 1).cast("decimal(38,0)")
        * F.col("w2").cast("decimal(38,0)")
        + F.col("u4")
    )
    agg = agg.select(
        "n", "nx", F.col("u4").alias("__u4"), v4.alias("__v4")
    )
    nn = F.col("n").cast("double")
    nxd = F.col("nx").cast("double")
    mm = nn - nxd
    eu = nxd * (nn + 1.0) * (2.0 * nn + 1.0) / 6.0
    varu = (
        mm * nxd * (nn + 1.0) * (2.0 * nn + 1.0) * (8.0 * nn + 11.0)
        / 180.0
    )
    u_star = (F.col("__u4").cast("double") / 4.0 - eu) / F.sqrt(varu)
    v_star = (F.col("__v4").cast("double") / 4.0 - eu) / F.sqrt(varu)
    rho = (
        2.0 * (nn * nn - 4.0) / ((2.0 * nn + 1.0) * (8.0 * nn + 11.0))
        - 1.0
    )
    c_stat = (
        u_star * u_star + v_star * v_star - 2.0 * rho * u_star * v_star
    ) / (2.0 * (1.0 - rho * rho))
    return agg.select(
        F.col("nx").alias("n_x"),
        (F.col("n") - F.col("nx")).cast("bigint").alias("n_y"),
        F.round(u_star, round_to).alias("u_star"),
        F.round(v_star, round_to).alias("v_star"),
        F.round(c_stat, round_to).alias("c_stat"),
    )


def cucconi_test_sql(
    src_sql: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`cucconi_test` (same rollup, same exact
    V4 expansion, same closed-form shapes)."""
    return f"""
    WITH src AS ({src_sql}),
    pts AS (
      SELECT ({group_col}) AS g, CAST({value_col} AS DOUBLE) AS v FROM src
    ),
    ranked AS (
      SELECT g, v,
             CAST(ROW_NUMBER() OVER (ORDER BY v ASC, g ASC) AS BIGINT)
               AS r
      FROM pts
    ),
    perval AS (
      SELECT v,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS m,
             CAST(MIN(r) AS BIGINT) AS rmin
      FROM ranked GROUP BY v
    ),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS nx,
             CAST(SUM(m * (2 * rmin + c - 1)) AS BIGINT) AS w2,
             SUM(CAST(m AS DECIMAL(38,0))
                 * CAST((2 * rmin + c - 1) * (2 * rmin + c - 1)
                        AS DECIMAL(38,0))) AS u4
      FROM perval
    ),
    ex AS (
      SELECT n, nx, u4,
             CAST(4 AS DECIMAL(38,0))
               * CAST(n + 1 AS DECIMAL(38,0))
               * CAST(n + 1 AS DECIMAL(38,0))
               * CAST(nx AS DECIMAL(38,0))
             - CAST(4 AS DECIMAL(38,0))
               * CAST(n + 1 AS DECIMAL(38,0))
               * CAST(w2 AS DECIMAL(38,0))
             + u4 AS v4
      FROM agg
    ),
    z AS (
      SELECT *,
        (CAST(u4 AS DOUBLE) / 4.0
         - CAST(nx AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
           * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0)
        / sqrt((CAST(n AS DOUBLE) - CAST(nx AS DOUBLE))
               * CAST(nx AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
               * (2.0 * CAST(n AS DOUBLE) + 1.0)
               * (8.0 * CAST(n AS DOUBLE) + 11.0) / 180.0) AS u_star,
        (CAST(v4 AS DOUBLE) / 4.0
         - CAST(nx AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
           * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0)
        / sqrt((CAST(n AS DOUBLE) - CAST(nx AS DOUBLE))
               * CAST(nx AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
               * (2.0 * CAST(n AS DOUBLE) + 1.0)
               * (8.0 * CAST(n AS DOUBLE) + 11.0) / 180.0) AS v_star,
        2.0 * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 4.0)
          / ((2.0 * CAST(n AS DOUBLE) + 1.0)
             * (8.0 * CAST(n AS DOUBLE) + 11.0)) - 1.0 AS rho
      FROM ex
    )
    SELECT nx AS n_x,
           CAST(n - nx AS BIGINT) AS n_y,
           ROUND(u_star, {round_to}) AS u_star,
           ROUND(v_star, {round_to}) AS v_star,
           ROUND((u_star * u_star + v_star * v_star
                  - 2.0 * rho * u_star * v_star)
                 / (2.0 * (1.0 - rho * rho)), {round_to}) AS c_stat
    FROM z
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 147: Mood squared-rank scale test
# ──────────────────────────────────────────────────────────────────────────


def mood_scale_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Mood (1954) squared-rank SCALE test: scores are the squared
    centered ranks ``s_i = (r_i − (N+1)/2)²``, T = Σ over sample x —
    the pure-dispersion member of the rank-test family (median_test
    is Mood's LOCATION test; this is his scale companion). Verdict
    under ties via the GENERAL two-sample linear-rank moments on
    mid-rank scores (exact, the lepage/cucconi discipline):
    ``E[T] = n_x·s̄``, ``Var[T] = n_x·n_y/(N(N−1))·Σ(s_i − s̄)²``.

    Exactness ledger: the doubled centered mid-rank
    ``d_v = 2·lo + c − 1 − (N+1)`` is an exact integer, so
    s4 = d² = 4·s is exact; T4 = Σ m_v·s4_v and SS4 = Σ c_v·s4_v
    accumulate as DECIMAL(38,0) (the bigint accumulator would wrap at
    Σ ≈ 4N³ ≈ 2^63 around N ~ 1.3e6 rows — a real 100× hazard; DuckDB
    reaches HUGEINT on its own, Spark needs the explicit decimal).
    The only unordered double sum is Q = Σ c_v·s4_v² (~16N⁵, far past
    any integer width) — its ulp drift reaches z at relative ~1e-13,
    and it is never emitted or ROUNDed. t_stat = T4/4 is emitted
    unrounded: a once-cast exact decimal, bit-identical cross-engine.

    One global rank window, one distinct-value rollup, one k-row
    reduction. Output (one row): (n_x, n_y, t_stat, z_stat).
    """
    pts = df.select(
        F.col(group_col).cast("boolean").alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    w = Window.orderBy(F.col("__v").asc(), F.col("__g").asc())
    ranked = pts.withColumn("__r", F.row_number().over(w).cast("bigint"))
    n_row = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    perval = (
        ranked.crossJoin(F.broadcast(n_row))
        .groupBy("__v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(F.col("__g").cast("bigint")).cast("bigint").alias("m"),
            F.min("__r").alias("rmin"),
            F.max("__n").alias("n_tot"),
        )
    )
    d = 2 * F.col("rmin") + F.col("c") - 1 - (F.col("n_tot") + 1)
    s4 = (d * d).cast("decimal(38,0)")
    agg = perval.agg(
        F.max("n_tot").alias("n"),
        F.sum("m").cast("bigint").alias("nx"),
        F.sum(F.col("m").cast("decimal(38,0)") * s4).alias("__t4"),
        F.sum(F.col("c").cast("decimal(38,0)") * s4).alias("__ss4"),
        F.sum(
            F.col("c").cast("double")
            * s4.cast("double")
            * s4.cast("double")
        ).alias("__q"),
    )
    nn = F.col("n").cast("double")
    nxd = F.col("nx").cast("double")
    t4d = F.col("__t4").cast("double")
    ss4d = F.col("__ss4").cast("double")
    z = (t4d / 4.0 - nxd * ss4d / (4.0 * nn)) / F.sqrt(
        (nxd * (nn - nxd) / (nn * (nn - 1.0)))
        * ((F.col("__q") - ss4d * ss4d / nn) / 16.0)
    )
    return agg.select(
        F.col("nx").alias("n_x"),
        (F.col("n") - F.col("nx")).cast("bigint").alias("n_y"),
        (t4d / 4.0).alias("t_stat"),
        F.round(z, round_to).alias("z_stat"),
    )


def mood_scale_test_sql(
    src_sql: str,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`mood_scale_test` (same rollup, same
    DECIMAL(38,0) accumulators, same closed-form shapes)."""
    return f"""
    WITH src AS ({src_sql}),
    pts AS (
      SELECT ({group_col}) AS g, CAST({value_col} AS DOUBLE) AS v FROM src
    ),
    ranked AS (
      SELECT g, v,
             CAST(ROW_NUMBER() OVER (ORDER BY v ASC, g ASC) AS BIGINT)
               AS r
      FROM pts
    ),
    nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
    perval AS (
      SELECT v,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS m,
             CAST(MIN(r) AS BIGINT) AS rmin,
             MAX(nrow.n) AS n_tot
      FROM ranked CROSS JOIN nrow GROUP BY v
    ),
    scored AS (
      SELECT c, m, n_tot,
             CAST((2 * rmin + c - 1 - (n_tot + 1))
                  * (2 * rmin + c - 1 - (n_tot + 1))
                  AS DECIMAL(38,0)) AS s4
      FROM perval
    ),
    agg AS (
      SELECT MAX(n_tot) AS n,
             CAST(SUM(m) AS BIGINT) AS nx,
             SUM(CAST(m AS DECIMAL(38,0)) * s4) AS t4,
             SUM(CAST(c AS DECIMAL(38,0)) * s4) AS ss4,
             SUM(CAST(c AS DOUBLE) * CAST(s4 AS DOUBLE)
                 * CAST(s4 AS DOUBLE)) AS q
      FROM scored
    )
    SELECT nx AS n_x,
           CAST(n - nx AS BIGINT) AS n_y,
           CAST(t4 AS DOUBLE) / 4.0 AS t_stat,
           ROUND((CAST(t4 AS DOUBLE) / 4.0
                  - CAST(nx AS DOUBLE) * CAST(ss4 AS DOUBLE)
                    / (4.0 * CAST(n AS DOUBLE)))
                 / sqrt((CAST(nx AS DOUBLE)
                         * (CAST(n AS DOUBLE) - CAST(nx AS DOUBLE))
                         / (CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) - 1.0)))
                        * ((q - CAST(ss4 AS DOUBLE)
                            * CAST(ss4 AS DOUBLE) / CAST(n AS DOUBLE))
                           / 16.0)),
                 {round_to}) AS z_stat
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 151: Hodges-Lehmann two-sample shift estimator
# ──────────────────────────────────────────────────────────────────────────


def hodges_lehmann_shift(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Hodges-Lehmann two-sample shift estimate: the MEDIAN of all
    m·n pairwise differences x_i − y_j — the location estimator the
    Wilcoxon test implicitly inverts (30% efficiency loss vs the mean
    under normality, but a 29% breakdown point vs the mean's 0%), and
    the robust answer to "how big is the shift mann_whitney detected?"

    Scale shape — HISTOGRAM-space pairwise, never row-pairs: both
    samples reduce to (distinct value, count) histograms first, the
    cross product is O(d_x·d_y) where d_* are DISTINCT 2-decimal
    value counts (bounded by the value domain, not by row count), and
    the median of differences is the exact WEIGHTED median over that
    product (cumulative weights in difference order, both middle
    order statistics averaged for even totals). 100 TB of rows with a
    bounded price domain still yields the same bounded product; the
    contract is the caller feeds a bounded-domain measure (2-decimal
    money/quantity), which every spec in this suite does.

    Everything is exact: counts are bigints, differences are exact
    DECIMAL(19,2), pair weights c_x·c_y and their prefix sums are
    bigints, and the final average of the two middle differences is
    one double operation on exact inputs — bit-identical cross-engine.

    Output (one row): (n_x, n_y, n_pairs, hl_shift).
    """
    pts = df.select(
        F.col(group_col).cast("boolean").alias("__g"),
        F.col(value_col).cast("decimal(18,2)").alias("__v"),
    )
    hx = (
        pts.filter(F.col("__g"))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cx"))
        .select(F.col("__v").alias("vx"), "cx")
    )
    hy = (
        pts.filter(~F.col("__g"))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cy"))
        .select(F.col("__v").alias("vy"), "cy")
    )
    pairs = hx.crossJoin(hy).select(
        (F.col("vx") - F.col("vy")).alias("d"),
        (F.col("cx") * F.col("cy")).alias("w"),
    )
    # merge equal differences before the cumulative pass
    hist = pairs.groupBy("d").agg(F.sum("w").cast("bigint").alias("w"))
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "d", F.sum("w").over(wcum).alias("cum")
    )
    tot = pts.agg(
        F.sum(F.when(F.col("__g"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_x"),
        F.sum(F.when(F.col("__g"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_y"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    np_ = F.col("n_x") * F.col("n_y")
    # middle order-statistic ranks: (N+1-(N+1)%2)/2 and
    # (N+2-(N+2)%2)/2 give (ceil(N/2), floor(N/2)+1 for even N;
    # both (N+1)/2 for odd N) with an even numerator, so the /2 is
    # exact in either engine's division semantics
    agg = j.agg(
        F.max("n_x").alias("n_x"),
        F.max("n_y").alias("n_y"),
        F.max(np_).alias("n_pairs"),
        F.min(
            F.when(
                F.col("cum") >= ((np_ + 1) - (np_ + 1) % 2) / 2,
                F.col("d"),
            )
        ).alias("__d1"),
        F.min(
            F.when(
                F.col("cum") >= ((np_ + 2) - (np_ + 2) % 2) / 2,
                F.col("d"),
            )
        ).alias("__d2"),
    )
    return agg.select(
        "n_x",
        "n_y",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        (
            (F.col("__d1").cast("double") + F.col("__d2").cast("double"))
            / 2.0
        ).alias("hl_shift"),
    )


def hodges_lehmann_shift_sql(
    src_sql: str,
    group_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`hodges_lehmann_shift` (same histogram
    cross product, same weighted-median ranks)."""
    return f"""
    WITH src AS ({src_sql}),
    pts AS (
      SELECT ({group_col}) AS g, CAST({value_col} AS DECIMAL(18,2)) AS v
      FROM src
    ),
    hx AS (
      SELECT v AS vx, CAST(COUNT(*) AS BIGINT) AS cx
      FROM pts WHERE g GROUP BY v
    ),
    hy AS (
      SELECT v AS vy, CAST(COUNT(*) AS BIGINT) AS cy
      FROM pts WHERE NOT g GROUP BY v
    ),
    hist AS (
      SELECT vx - vy AS d, CAST(SUM(cx * cy) AS BIGINT) AS w
      FROM hx CROSS JOIN hy GROUP BY 1
    ),
    cum AS (
      SELECT d,
             SUM(w) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
      FROM hist
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_x,
             CAST(SUM(CASE WHEN g THEN 0 ELSE 1 END) AS BIGINT) AS n_y
      FROM pts
    )
    SELECT MAX(n_x) AS n_x,
           MAX(n_y) AS n_y,
           CAST(MAX(n_x * n_y) AS BIGINT) AS n_pairs,
           (CAST(MIN(CASE WHEN cum >= ((n_x * n_y + 1)
                                       - (n_x * n_y + 1) % 2) / 2
                          THEN d END) AS DOUBLE)
            + CAST(MIN(CASE WHEN cum >= ((n_x * n_y + 2)
                                         - (n_x * n_y + 2) % 2) / 2
                           THEN d END) AS DOUBLE)) / 2.0 AS hl_shift
    FROM cum CROSS JOIN tot
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 152: Quade range-weighted block rank test
# ──────────────────────────────────────────────────────────────────────────


def quade_test(
    df: DataFrame,
    block_col: str,
    treat_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Quade test (1979) for k treatments in n complete blocks — the
    range-WEIGHTED upgrade of friedman_test: blocks where treatments
    differ by a lot carry proportionally more weight (Friedman throws
    that information away by using within-block ranks alone),

      r_ij = within-block mid-rank of x_ij;
      Q_i  = across-block mid-rank of the block RANGE
             max_j x_ij − min_j x_ij;
      S_ij = Q_i·(r_ij − (k+1)/2);  S_j = Σ_i S_ij;
      F = (n−1)·B/(A−B),  A = Σ S_ij²,  B = (1/n) Σ_j S_j²
      ~ F(k−1, (n−1)(k−1)).

    Exactness ledger: DOUBLED mid-ranks make 2r_ij − (k+1) and 2Q_i
    exact integers, so S4_ij = 2Q_i·(2r_ij−(k+1)) = 4·S_ij is exact;
    S4_j sums are bigints and both quadratic accumulators (A4 = ΣS4²,
    B4 = ΣS4_j²) run as DECIMAL(38,0) (they grow ~n³k², past int64
    for large block counts). The factor 16 cancels in F. Blocks
    missing any treatment are DROPPED (complete-block design, the
    page_trend convention); A = B (all blocks ranking identically,
    zero within-rank variance left) returns NULL f_stat — perfect
    separation has no F-denominator, same contract in the twin.

    One (block × treatment) rollup, two rank windows (within-block
    over k, across-blocks over n), one broadcast join of the n-row
    block-weight table, a k-row reduction. Output (one row):
    (n_blocks, k_treatments, quade_f).
    """
    cell = df.groupBy(
        F.col(block_col).alias("b"), F.col(treat_col).cast("bigint").alias("t")
    ).agg(F.sum(F.col(value_col).cast("decimal(18,2)")).alias("v"))
    kk = cell.agg(F.countDistinct("t").cast("bigint").alias("k"))
    full = (
        cell.groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nt"),
            F.collect_list(F.struct("t", "v")).alias("__c"),
        )
        .crossJoin(F.broadcast(kk))
        .filter(F.col("nt") == F.col("k"))
        .select("b", F.explode("__c").alias("e"), "k")
        .select("b", F.col("e.t").alias("t"), F.col("e.v").alias("v"), "k")
    )
    # within-block doubled mid-ranks of v (ties share the mid-rank)
    wr = Window.partitionBy("b").orderBy(F.col("v").asc())
    wv = Window.partitionBy("b", "v")
    ranked = full.select(
        "b",
        "t",
        "k",
        "v",
        (
            2 * F.rank().over(wr).cast("bigint")
            + F.count(F.lit(1)).over(wv).cast("bigint")
            - 1
        ).alias("__dr2"),  # doubled mid-rank: 2*minrank + ties - 1
    )
    # block ranges and their across-block doubled mid-ranks
    rng = full.groupBy("b").agg(
        (F.max("v") - F.min("v")).alias("__rng")
    )
    wq = Window.orderBy(F.col("__rng").asc())
    wqe = Window.partitionBy("__rng")
    q = rng.select(
        "b",
        (
            2 * F.rank().over(wq).cast("bigint")
            + F.count(F.lit(1)).over(wqe).cast("bigint")
            - 1
        ).alias("__q2"),
    )
    joined = ranked.join(F.broadcast(q), "b")
    s4 = F.col("__q2") * (F.col("__dr2") - (F.col("k") + 1))
    per_t = joined.groupBy("t").agg(
        F.max("k").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum(s4).cast("bigint").alias("__s4j"),
        F.sum(
            s4.cast("decimal(38,0)") * s4.cast("decimal(38,0)")
        ).alias("__a4j"),
    )
    agg = per_t.agg(
        F.max("k").alias("k"),
        F.max("nb").cast("bigint").alias("n"),
        F.sum("__a4j").alias("__a4"),
        F.sum(
            F.col("__s4j").cast("decimal(38,0)")
            * F.col("__s4j").cast("decimal(38,0)")
        ).alias("__b4n"),
    )
    nn = F.col("n").cast("double")
    a4 = F.col("__a4").cast("double")
    b4 = F.col("__b4n").cast("double") / nn
    f = F.when(
        a4 - b4 > 0,
        F.round((nn - 1.0) * b4 / (a4 - b4), round_to),
    )
    return agg.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        f.alias("quade_f"),
    )


def quade_test_sql(
    src_sql: str,
    block_col: str,
    treat_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`quade_test` (same doubled mid-ranks,
    DECIMAL(38,0) quadratic accumulators, same NULL contract)."""
    return f"""
    WITH src AS ({src_sql}),
    cell AS (
      SELECT {block_col} AS b, CAST({treat_col} AS BIGINT) AS t,
             SUM(CAST({value_col} AS DECIMAL(18,2))) AS v
      FROM src GROUP BY 1, 2
    ),
    kk AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cell),
    full_blocks AS (
      SELECT b FROM cell CROSS JOIN kk
      GROUP BY b, k HAVING COUNT(*) = MAX(k)
    ),
    fcell AS (
      SELECT c.b, c.t, c.v, kk.k
      FROM cell c JOIN full_blocks USING (b) CROSS JOIN kk
    ),
    ranked AS (
      SELECT b, t, k,
             2 * CAST(RANK() OVER (PARTITION BY b ORDER BY v ASC)
                      AS BIGINT)
             + CAST(COUNT(*) OVER (PARTITION BY b, v) AS BIGINT)
             - 1 AS dr2
      FROM fcell
    ),
    rng AS (
      SELECT b, MAX(v) - MIN(v) AS rng FROM fcell GROUP BY b
    ),
    q AS (
      SELECT b,
             2 * CAST(RANK() OVER (ORDER BY rng ASC) AS BIGINT)
             + CAST(COUNT(*) OVER (PARTITION BY rng) AS BIGINT)
             - 1 AS q2
      FROM rng
    ),
    scored AS (
      SELECT r.t, r.k, q.q2 * (r.dr2 - (r.k + 1)) AS s4
      FROM ranked r JOIN q USING (b)
    ),
    per_t AS (
      SELECT t, MAX(k) AS k,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(s4) AS BIGINT) AS s4j,
             SUM(CAST(s4 AS DECIMAL(38,0)) * CAST(s4 AS DECIMAL(38,0)))
               AS a4j
      FROM scored GROUP BY t
    ),
    agg AS (
      SELECT MAX(k) AS k,
             CAST(MAX(nb) AS BIGINT) AS n,
             SUM(a4j) AS a4,
             SUM(CAST(s4j AS DECIMAL(38,0)) * CAST(s4j AS DECIMAL(38,0)))
               AS b4n
      FROM per_t
    )
    SELECT n AS n_blocks,
           k AS k_treatments,
           CASE WHEN CAST(a4 AS DOUBLE)
                     - CAST(b4n AS DOUBLE) / CAST(n AS DOUBLE) > 0
                THEN ROUND((CAST(n AS DOUBLE) - 1.0)
                           * (CAST(b4n AS DOUBLE) / CAST(n AS DOUBLE))
                           / (CAST(a4 AS DOUBLE)
                              - CAST(b4n AS DOUBLE) / CAST(n AS DOUBLE)),
                           {round_to})
           END AS quade_f
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 161: mSPRT always-valid A/B monitor
# ──────────────────────────────────────────────────────────────────────────


def msprt_ab_monitor(
    df: DataFrame,
    ts_col: str,
    arm_col: str,
    outcome_col: str,
    tau: float = 0.02,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Mixture SPRT always-valid p-value for a two-arm conversion
    test (Johari, Koomen, Pekelis & Walsh 2017, "Peeking at A/B
    Tests") — the sequential monitor that stays valid under
    CONTINUOUS peeking, where sprt_conversion_monitor's Wald test
    needs a pre-committed alternative and a single look policy:

      per day d (cumulative): Δ̂ = p̂_t − p̂_c,
      V = p̂(1−p̂)(1/n_t + 1/n_c)  (pooled);
      Λ_d = sqrt(V/(V+τ²)) · exp(Δ̂²τ² / (2V(V+τ²)));
      p_d  = min(1, min_{d'≤d} 1/Λ_{d'})  — monotone, always valid.

    Days where either arm is empty or the pooled rate is degenerate
    (0 or 1) are excluded from the likelihood (V undefined) but still
    advance the calendar. All inputs to the closed forms are exact
    integer cumulative counts (one ordered days window), so both
    engines evaluate identical IEEE expressions; exp/sqrt magnitudes
    are O(1).

    Output (one row): (n_days, n_treat, n_ctrl, x_treat, x_ctrl,
    p_always_valid, first_sig_day — the first day index whose
    instantaneous 1/Λ fell to ``alpha``, NULL if never).
    """
    t2 = float(tau) * float(tau)
    day = F.col(ts_col).cast("date")
    daily = df.groupBy(day.alias("d")).agg(
        F.sum(F.when(F.col(arm_col), 1).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.sum(
            F.when(F.col(arm_col), F.col(outcome_col).cast("int")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("xt"),
        F.sum(F.when(F.col(arm_col), 0).otherwise(1))
        .cast("bigint")
        .alias("nc"),
        F.sum(
            F.when(
                F.col(arm_col), F.lit(0)
            ).otherwise(F.col(outcome_col).cast("int"))
        )
        .cast("bigint")
        .alias("xc"),
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wrow = Window.orderBy("d")
    cum = daily.select(
        "d",
        F.row_number().over(wrow).cast("bigint").alias("i"),
        F.sum("nt").over(wcum).alias("cnt"),
        F.sum("xt").over(wcum).alias("cxt"),
        F.sum("nc").over(wcum).alias("cnc"),
        F.sum("xc").over(wcum).alias("cxc"),
    )
    ntd = F.col("cnt").cast("double")
    ncd = F.col("cnc").cast("double")
    pbar = (F.col("cxt") + F.col("cxc")).cast("double") / (ntd + ncd)
    delta = F.col("cxt").cast("double") / ntd - F.col(
        "cxc"
    ).cast("double") / ncd
    v = pbar * (1.0 - pbar) * (1.0 / ntd + 1.0 / ncd)
    lam = F.sqrt(v / (v + F.lit(t2))) * F.exp(
        delta * delta * F.lit(t2) / (2.0 * v * (v + F.lit(t2)))
    )
    ok = (
        (F.col("cnt") > 0)
        & (F.col("cnc") > 0)
        & (pbar > 0.0)
        & (pbar < 1.0)
    )
    scored = cum.select(
        "i",
        "cnt",
        "cxt",
        "cnc",
        "cxc",
        F.when(ok, 1.0 / lam).alias("inst_p"),
    )
    agg = scored.agg(
        F.max("i").alias("n_days"),
        F.max("cnt").alias("n_treat"),
        F.max("cnc").alias("n_ctrl"),
        F.max("cxt").alias("x_treat"),
        F.max("cxc").alias("x_ctrl"),
        F.least(F.lit(1.0), F.min("inst_p")).alias("__p"),
        F.min(
            F.when(F.col("inst_p") <= float(alpha), F.col("i"))
        ).alias("first_sig_day"),
    )
    return agg.select(
        "n_days",
        "n_treat",
        "n_ctrl",
        "x_treat",
        "x_ctrl",
        F.round(F.col("__p"), round_to).alias("p_always_valid"),
        "first_sig_day",
    )


def msprt_ab_monitor_sql(
    table: str,
    ts_col: str,
    arm_expr: str,
    outcome_expr: str,
    tau: float = 0.02,
    alpha: float = 0.05,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`msprt_ab_monitor` (same cumulative
    integer counts, same mixture-LR shapes)."""
    t2 = float(tau) * float(tau)
    return f"""
    WITH daily AS (
      SELECT CAST({ts_col} AS DATE) AS d,
             CAST(SUM(CASE WHEN {arm_expr} THEN 1 ELSE 0 END)
                  AS BIGINT) AS nt,
             CAST(SUM(CASE WHEN {arm_expr}
                      THEN CAST({outcome_expr} AS INTEGER)
                      ELSE 0 END) AS BIGINT) AS xt,
             CAST(SUM(CASE WHEN {arm_expr} THEN 0 ELSE 1 END)
                  AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN {arm_expr} THEN 0
                      ELSE CAST({outcome_expr} AS INTEGER) END)
                  AS BIGINT) AS xc
      FROM {table} GROUP BY 1
    ),
    cum AS (
      SELECT d,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i,
             SUM(nt) OVER w AS cnt, SUM(xt) OVER w AS cxt,
             SUM(nc) OVER w AS cnc, SUM(xc) OVER w AS cxc
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    scored AS (
      SELECT i, cnt, cxt, cnc, cxc,
             CASE WHEN cnt > 0 AND cnc > 0
                       AND CAST(cxt + cxc AS DOUBLE)
                           / (CAST(cnt AS DOUBLE)
                              + CAST(cnc AS DOUBLE)) > 0.0
                       AND CAST(cxt + cxc AS DOUBLE)
                           / (CAST(cnt AS DOUBLE)
                              + CAST(cnc AS DOUBLE)) < 1.0
             THEN 1.0 / (SQRT(
                    (CAST(cxt + cxc AS DOUBLE)
                     / (CAST(cnt AS DOUBLE) + CAST(cnc AS DOUBLE))
                     * (1.0 - CAST(cxt + cxc AS DOUBLE)
                        / (CAST(cnt AS DOUBLE) + CAST(cnc AS DOUBLE)))
                     * (1.0 / CAST(cnt AS DOUBLE)
                        + 1.0 / CAST(cnc AS DOUBLE)))
                    / ((CAST(cxt + cxc AS DOUBLE)
                        / (CAST(cnt AS DOUBLE) + CAST(cnc AS DOUBLE))
                        * (1.0 - CAST(cxt + cxc AS DOUBLE)
                           / (CAST(cnt AS DOUBLE)
                              + CAST(cnc AS DOUBLE)))
                        * (1.0 / CAST(cnt AS DOUBLE)
                           + 1.0 / CAST(cnc AS DOUBLE)))
                       + {t2!r}))
                  * EXP((CAST(cxt AS DOUBLE) / CAST(cnt AS DOUBLE)
                         - CAST(cxc AS DOUBLE) / CAST(cnc AS DOUBLE))
                        * (CAST(cxt AS DOUBLE) / CAST(cnt AS DOUBLE)
                           - CAST(cxc AS DOUBLE) / CAST(cnc AS DOUBLE))
                        * {t2!r}
                        / (2.0 * (CAST(cxt + cxc AS DOUBLE)
                                  / (CAST(cnt AS DOUBLE)
                                     + CAST(cnc AS DOUBLE))
                                  * (1.0 - CAST(cxt + cxc AS DOUBLE)
                                     / (CAST(cnt AS DOUBLE)
                                        + CAST(cnc AS DOUBLE)))
                                  * (1.0 / CAST(cnt AS DOUBLE)
                                     + 1.0 / CAST(cnc AS DOUBLE)))
                           * ((CAST(cxt + cxc AS DOUBLE)
                               / (CAST(cnt AS DOUBLE)
                                  + CAST(cnc AS DOUBLE))
                               * (1.0 - CAST(cxt + cxc AS DOUBLE)
                                  / (CAST(cnt AS DOUBLE)
                                     + CAST(cnc AS DOUBLE)))
                               * (1.0 / CAST(cnt AS DOUBLE)
                                  + 1.0 / CAST(cnc AS DOUBLE)))
                              + {t2!r}))))
             END AS inst_p
      FROM cum
    )
    SELECT CAST(MAX(i) AS BIGINT) AS n_days,
           CAST(MAX(cnt) AS BIGINT) AS n_treat,
           CAST(MAX(cnc) AS BIGINT) AS n_ctrl,
           CAST(MAX(cxt) AS BIGINT) AS x_treat,
           CAST(MAX(cxc) AS BIGINT) AS x_ctrl,
           ROUND(LEAST(1.0, MIN(inst_p)), {round_to}) AS p_always_valid,
           MIN(CASE WHEN inst_p <= {float(alpha)!r} THEN i END)
             AS first_sig_day
    FROM scored
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 173: Stuart-Maxwell marginal-homogeneity test (3 categories)
# ──────────────────────────────────────────────────────────────────────────


def stuart_maxwell_test(
    df: DataFrame,
    unit_col: str,
    first_col: str,
    second_col: str,
    categories: "tuple[str, str, str]",
    round_to: int = 6,
) -> DataFrame:
    """Stuart-Maxwell test of MARGINAL HOMOGENEITY for paired
    3-category outcomes — the k-ary generalization of
    :func:`mcnemar`'s 2×2 (mcnemar_gates): same units measured
    twice, did the category DISTRIBUTION shift?  Cross-tab the pairs
    n_ij, take marginal differences d_i = row_i − col_i, and

      χ² = d' S⁻¹ d  over the first k−1 components,
      S_ii = row_i + col_i − 2 n_ii,  S_ij = −(n_ij + n_ji)

    ~ χ²(k−1) under homogeneity. For k = 3 the 2×2 inverse is closed
    form, so the whole statistic is a fixed expression over NINE
    exact integer cells — one groupBy to the 3×3 table, identical
    arithmetic in both engines. Perfect symmetry (all d_i = 0, or a
    singular S from empty off-diagonals) returns NULL by contract,
    like the suite's other degenerate-variance cases.

    Output (one row): (n_pairs, d1, d2, d3, sm_chi2).
    """
    c1, c2, c3 = categories
    fa = F.col(first_col)
    fb = F.col(second_col)
    cells = {}
    for i, ci in enumerate((c1, c2, c3), 1):
        for jj, cj in enumerate((c1, c2, c3), 1):
            cells[(i, jj)] = (
                F.sum(
                    ((fa == ci) & (fb == cj)).cast("long")
                )
                .cast("bigint")
                .alias(f"n{i}{jj}")
            )
    agg = df.agg(*cells.values())
    n = sum(F.col(f"n{i}{jj}") for i in (1, 2, 3) for jj in (1, 2, 3))
    row = {i: sum(F.col(f"n{i}{jj}") for jj in (1, 2, 3)) for i in (1, 2, 3)}
    col = {jj: sum(F.col(f"n{i}{jj}") for i in (1, 2, 3)) for jj in (1, 2, 3)}
    d = {i: (row[i] - col[i]).cast("double") for i in (1, 2, 3)}
    s11 = (row[1] + col[1] - 2 * F.col("n11")).cast("double")
    s22 = (row[2] + col[2] - 2 * F.col("n22")).cast("double")
    s12 = (-(F.col("n12") + F.col("n21"))).cast("double")
    det = s11 * s22 - s12 * s12
    chi2 = (
        s22 * d[1] * d[1]
        - 2.0 * s12 * d[1] * d[2]
        + s11 * d[2] * d[2]
    ) / det
    return agg.select(
        n.cast("bigint").alias("n_pairs"),
        d[1].cast("bigint").alias("d1"),
        d[2].cast("bigint").alias("d2"),
        d[3].cast("bigint").alias("d3"),
        F.when(det > 0, F.round(chi2, round_to)).alias("sm_chi2"),
    )


def stuart_maxwell_test_sql(
    src_sql: str,
    first_col: str,
    second_col: str,
    categories: "tuple[str, str, str]",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`stuart_maxwell_test`."""
    c1, c2, c3 = categories
    cell_defs = []
    for i, ci in enumerate((c1, c2, c3), 1):
        for jj, cj in enumerate((c1, c2, c3), 1):
            cell_defs.append(
                f"CAST(SUM(CASE WHEN {first_col} = '{ci}'"
                f" AND {second_col} = '{cj}' THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS n{i}{jj}"
            )
    cells = ",\n             ".join(cell_defs)
    rows = {
        i: " + ".join(f"n{i}{jj}" for jj in (1, 2, 3)) for i in (1, 2, 3)
    }
    cols = {
        jj: " + ".join(f"n{i}{jj}" for i in (1, 2, 3)) for jj in (1, 2, 3)
    }
    d = {
        i: f"CAST(({rows[i]}) - ({cols[i]}) AS DOUBLE)" for i in (1, 2, 3)
    }
    s11 = f"CAST(({rows[1]}) + ({cols[1]}) - 2 * n11 AS DOUBLE)"
    s22 = f"CAST(({rows[2]}) + ({cols[2]}) - 2 * n22 AS DOUBLE)"
    s12 = "CAST(-(n12 + n21) AS DOUBLE)"
    det = f"({s11} * {s22} - {s12} * {s12})"
    chi2 = (
        f"(({s22}) * ({d[1]}) * ({d[1]})"
        f" - 2.0 * ({s12}) * ({d[1]}) * ({d[2]})"
        f" + ({s11}) * ({d[2]}) * ({d[2]})) / {det}"
    )
    total = " + ".join(
        f"n{i}{jj}" for i in (1, 2, 3) for jj in (1, 2, 3)
    )
    return f"""
    WITH src AS ({src_sql}),
    agg AS (
      SELECT {cells}
      FROM src
    )
    SELECT CAST({total} AS BIGINT) AS n_pairs,
           CAST(({rows[1]}) - ({cols[1]}) AS BIGINT) AS d1,
           CAST(({rows[2]}) - ({cols[2]}) AS BIGINT) AS d2,
           CAST(({rows[3]}) - ({cols[3]}) AS BIGINT) AS d3,
           CASE WHEN {det} > 0
                THEN ROUND({chi2}, {round_to}) END AS sm_chi2
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 174: DeLong confidence interval for AUC
# ──────────────────────────────────────────────────────────────────────────

_Z975 = 1.959963984540054  # N(0,1) 97.5th percentile, fixed literal


def auc_delong_ci(
    df: DataFrame,
    score_col,
    label_col,
    round_to: int = 6,
) -> DataFrame:
    """DeLong, DeLong & Clarke-Pearson (1988) standard error and 95%
    CI for the Mann-Whitney AUC — the missing error bar on
    auc_quality_score's point estimate ("AUC 0.71" means nothing
    without knowing if ±0.01 or ±0.15; bootstrap costs hundreds of
    resamples, DeLong is closed-form).

    Placement-value formulation on the DISTINCT-SCORE rollup (the
    bounded-cardinality shape of the suite's AUC): all positives
    sharing score s share the placement value
    ``v10(s) = (#neg below + ½·#neg at) / n0`` (mid-rank tie
    handling), and symmetrically v01 for negatives, so the empirical
    variances S10/S01 are WEIGHTED variances over the score table —
    one cumulative window over distinct scores, never a row-level
    sort:

      SE = sqrt(S10/n1 + S01/n0);  CI95 = AUC ± 1.95996·SE.

    Output (one row): (n_pos, n_neg, auc, se_delong, ci_lo, ci_hi).
    """
    s = score_col if not isinstance(score_col, str) else F.col(score_col)
    lab = (
        label_col if not isinstance(label_col, str) else F.col(label_col)
    )
    per = df.groupBy(s.alias("s")).agg(
        F.sum(lab.cast("long")).cast("bigint").alias("c1"),
        F.sum((~lab.cast("boolean")).cast("long"))
        .cast("bigint")
        .alias("c0"),
    )
    w_below = (
        Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_above = (
        Window.orderBy("s").rowsBetween(1, Window.unboundedFollowing)
    )
    cum = per.select(
        "s",
        "c1",
        "c0",
        F.coalesce(F.sum("c0").over(w_below), F.lit(0)).alias("b0"),
        F.coalesce(F.sum("c1").over(w_above), F.lit(0)).alias("a1"),
    )
    tot = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    v10 = (
        F.col("b0").cast("double")
        + 0.5 * F.col("c0").cast("double")
    ) / F.col("n0").cast("double")
    v01 = (
        F.col("a1").cast("double")
        + 0.5 * F.col("c1").cast("double")
    ) / F.col("n1").cast("double")
    agg = j.agg(
        F.max("n1").alias("n_pos"),
        F.max("n0").alias("n_neg"),
        F.sum(F.col("c1").cast("double") * v10).alias("sv10"),
        F.sum(F.col("c1").cast("double") * v10 * v10).alias("sv10b"),
        F.sum(F.col("c0").cast("double") * v01).alias("sv01"),
        F.sum(F.col("c0").cast("double") * v01 * v01).alias("sv01b"),
    )
    n1 = F.col("n_pos").cast("double")
    n0 = F.col("n_neg").cast("double")
    auc = F.col("sv10") / n1
    s10 = (F.col("sv10b") - F.col("sv10") * F.col("sv10") / n1) / (
        n1 - 1.0
    )
    s01 = (F.col("sv01b") - F.col("sv01") * F.col("sv01") / n0) / (
        n0 - 1.0
    )
    se = F.sqrt(s10 / n1 + s01 / n0)
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(auc, round_to).alias("auc"),
        F.round(se, round_to).alias("se_delong"),
        F.round(auc - F.lit(_Z975) * se, round_to).alias("ci_lo"),
        F.round(auc + F.lit(_Z975) * se, round_to).alias("ci_hi"),
    )


def auc_delong_ci_sql(
    table: str,
    score_col: str,
    label_expr: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`auc_delong_ci`."""
    return f"""
    WITH per AS (
      SELECT {score_col} AS s,
             CAST(SUM(CASE WHEN {label_expr} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN {label_expr} THEN 0 ELSE 1 END)
                  AS BIGINT) AS c0
      FROM {table} GROUP BY 1
    ),
    cum AS (
      SELECT s, c1, c0,
             COALESCE(SUM(c0) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS b0,
             COALESCE(SUM(c1) OVER (ORDER BY s
                      ROWS BETWEEN 1 FOLLOWING
                      AND UNBOUNDED FOLLOWING), 0) AS a1
      FROM per
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c0) AS BIGINT) AS n0
      FROM cum
    ),
    sums AS (
      SELECT MAX(t.n1) AS n_pos, MAX(t.n0) AS n_neg,
             SUM(CAST(c1 AS DOUBLE)
                 * ((CAST(b0 AS DOUBLE) + 0.5 * CAST(c0 AS DOUBLE))
                    / CAST(t.n0 AS DOUBLE))) AS sv10,
             SUM(CAST(c1 AS DOUBLE)
                 * ((CAST(b0 AS DOUBLE) + 0.5 * CAST(c0 AS DOUBLE))
                    / CAST(t.n0 AS DOUBLE))
                 * ((CAST(b0 AS DOUBLE) + 0.5 * CAST(c0 AS DOUBLE))
                    / CAST(t.n0 AS DOUBLE))) AS sv10b,
             SUM(CAST(c0 AS DOUBLE)
                 * ((CAST(a1 AS DOUBLE) + 0.5 * CAST(c1 AS DOUBLE))
                    / CAST(t.n1 AS DOUBLE))) AS sv01,
             SUM(CAST(c0 AS DOUBLE)
                 * ((CAST(a1 AS DOUBLE) + 0.5 * CAST(c1 AS DOUBLE))
                    / CAST(t.n1 AS DOUBLE))
                 * ((CAST(a1 AS DOUBLE) + 0.5 * CAST(c1 AS DOUBLE))
                    / CAST(t.n1 AS DOUBLE))) AS sv01b
      FROM cum CROSS JOIN tot t
    )
    SELECT n_pos, n_neg,
           ROUND(sv10 / CAST(n_pos AS DOUBLE), {round_to}) AS auc,
           ROUND(SQRT(((sv10b - sv10 * sv10 / CAST(n_pos AS DOUBLE))
                       / (CAST(n_pos AS DOUBLE) - 1.0))
                      / CAST(n_pos AS DOUBLE)
                      + ((sv01b - sv01 * sv01 / CAST(n_neg AS DOUBLE))
                         / (CAST(n_neg AS DOUBLE) - 1.0))
                        / CAST(n_neg AS DOUBLE)),
                 {round_to}) AS se_delong,
           ROUND(sv10 / CAST(n_pos AS DOUBLE)
                 - {_Z975!r}
                   * SQRT(((sv10b - sv10 * sv10
                            / CAST(n_pos AS DOUBLE))
                           / (CAST(n_pos AS DOUBLE) - 1.0))
                          / CAST(n_pos AS DOUBLE)
                          + ((sv01b - sv01 * sv01
                              / CAST(n_neg AS DOUBLE))
                             / (CAST(n_neg AS DOUBLE) - 1.0))
                            / CAST(n_neg AS DOUBLE)),
                 {round_to}) AS ci_lo,
           ROUND(sv10 / CAST(n_pos AS DOUBLE)
                 + {_Z975!r}
                   * SQRT(((sv10b - sv10 * sv10
                            / CAST(n_pos AS DOUBLE))
                           / (CAST(n_pos AS DOUBLE) - 1.0))
                          / CAST(n_pos AS DOUBLE)
                          + ((sv01b - sv01 * sv01
                              / CAST(n_neg AS DOUBLE))
                             / (CAST(n_neg AS DOUBLE) - 1.0))
                            / CAST(n_neg AS DOUBLE)),
                 {round_to}) AS ci_hi
    FROM sums
    """
