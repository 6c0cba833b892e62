"""Survey-estimation kernels: delete-one-group jackknife variance and
the Horvitz-Thompson estimator under deterministic Poisson sampling.

Both follow the repo's exactness discipline end to end. The jackknife
replicate statistics are ratios of DECIMAL/bigint totals-minus-group,
so every θ_(−g) is the same double in both engines; the replicate
spread is a sum over the (small) group count. The HT design uses
inclusion probabilities drawn from {0.1, 0.5} ON PURPOSE: y/π and
y²·(1−π)/π² are then exact integer multiples of the DECIMAL value
(×10/×2 and ×90/×2), so the estimator and its Poisson variance
aggregate exactly and cast to double only at the very end — no
order-dependent float sums over the sampled table, at any scale.
Sampling itself is the portable md5 uniform shared with the bootstrap
kernels (operators/bootstrap.py), so both engines draw the identical
sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bootstrap import _DENOM


def jackknife_ratio_variance(
    df: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Delete-one-group jackknife for a ratio statistic θ = Σnum/Σden
    (the mean-per-unit family: average order value, revenue per
    order, …): leave each group g out, recompute θ_(−g) from
    totals-minus-group, and report

      se²_jack = (G−1)/G · Σ_g (θ_(−g) − θ̄_J)²
      bias_jack = (G−1) · (θ̄_J − θ̂)

    — the standard-error machinery for NON-LINEAR statistics whose
    per-row variance formulas don't exist, priced at one rollup plus
    a broadcast of the G-row replicate table (G = partitions/days/
    months, never rows). ``num_col`` must be DECIMAL-exact and
    ``den_col`` integer so every replicate is the identical double in
    both engines. Output (one row): n_groups, theta, bias_jack,
    se_jack."""
    per_g = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.sum(F.col(num_col)).alias("__sn"),
        F.sum(F.col(den_col)).cast("bigint").alias("__sd"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("__sn").alias("__tn"),
        F.sum("__sd").cast("bigint").alias("__td"),
    )
    # replicates are centered on the exact full-sample theta BEFORE
    # squaring: Σrep² agrees with G·r̄² to ~8 digits (every replicate
    # sits within a group's influence of θ̂), so the raw-moment form
    # cancels catastrophically and the last float digits would differ
    # across engines; the centered deviations are O(se) and sum safely
    reps = per_g.crossJoin(F.broadcast(tot)).select(
        "n_groups",
        (F.col("__tn").cast("double") / F.col("__td").cast("double")).alias(
            "__theta"
        ),
        (
            (F.col("__tn") - F.col("__sn")).cast("double")
            / (F.col("__td") - F.col("__sd")).cast("double")
            - F.col("__tn").cast("double") / F.col("__td").cast("double")
        ).alias("__d"),
    )
    g = reps.agg(
        F.max("n_groups").alias("n_groups"),
        F.max("__theta").alias("theta"),
        F.sum("__d").alias("__sd1"),
        F.sum(F.col("__d") * F.col("__d")).alias("__sd2"),
    )
    gg = F.col("n_groups").cast("double")
    var = (
        (gg - F.lit(1.0))
        / gg
        * (F.col("__sd2") - F.col("__sd1") * F.col("__sd1") / gg)
    )
    bias = (gg - F.lit(1.0)) * F.col("__sd1") / gg
    return g.select(
        "n_groups",
        F.round(F.col("theta"), round_to).alias("theta"),
        F.round(bias, round_to).alias("bias_jack"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), round_to).alias(
            "se_jack"
        ),
    )


def jackknife_ratio_variance_sql(
    source_sql: str,
    group_col: str,
    num_col: str,
    den_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`jackknife_ratio_variance`."""
    return f"""
    WITH src AS ({source_sql}),
    per_g AS (
      SELECT {group_col} AS g, SUM({num_col}) AS sn,
             CAST(SUM({den_col}) AS BIGINT) AS sd
      FROM src GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             SUM(sn) AS tn, CAST(SUM(sd) AS BIGINT) AS td
      FROM per_g
    ),
    reps AS (
      SELECT n_groups,
             CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) AS theta,
             CAST(tn - sn AS DOUBLE) / CAST(td - sd AS DOUBLE)
               - CAST(tn AS DOUBLE) / CAST(td AS DOUBLE) AS d
      FROM per_g CROSS JOIN tot
    ),
    g AS (
      SELECT MAX(n_groups) AS n_groups, MAX(theta) AS theta,
             SUM(d) AS sd1, SUM(d * d) AS sd2
      FROM reps
    )
    SELECT n_groups,
           ROUND(theta, {round_to}) AS theta,
           ROUND((CAST(n_groups AS DOUBLE) - 1.0) * sd1
                 / CAST(n_groups AS DOUBLE),
                 {round_to}) AS bias_jack,
           ROUND(SQRT(GREATEST((CAST(n_groups AS DOUBLE) - 1.0)
                               / CAST(n_groups AS DOUBLE)
                               * (sd2 - sd1 * sd1
                                        / CAST(n_groups AS DOUBLE)), 0.0)),
                 {round_to}) AS se_jack
    FROM g
    """


def horvitz_thompson_total(
    df: DataFrame,
    id_col: str,
    y_col: str,
    big_pred,
    round_to: int = 6,
) -> DataFrame:
    """Horvitz-Thompson total under deterministic Poisson sampling
    with a two-stratum design: rows satisfying ``big_pred`` are
    included with π = 0.5, the rest with π = 0.1 (size-biased
    sampling — the estimator that lets a pipeline weigh a 15% sample
    and still report an unbiased population total). Inclusion is the
    portable md5 uniform on ``id_col``, so both engines draw the
    identical sample.

      ŷ_HT = Σ_sampled y/π      V̂_Poisson = Σ_sampled y²(1−π)/π²

    With π ∈ {0.1, 0.5} these are exact DECIMAL multiples (×10/×2,
    ×90/×2) — no order-dependent float sums. Output (one row):
    n_pop, n_sampled, ht_total, true_total, rel_err, se_est."""
    u = F.expr(
        f"cast(conv(substring(md5(concat(cast({id_col} as string), "
        f"':ht')), 1, 15), 16, 10) as bigint)"
    ) / F.lit(_DENOM)
    y = F.col(y_col).cast("decimal(12,2)")
    base = df.select(
        y.alias("__y"),
        F.when(big_pred, F.lit(0.5)).otherwise(F.lit(0.1)).alias("__pi"),
        u.alias("__u"),
    )
    g = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum(F.when(F.col("__u") < F.col("__pi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
        F.sum("__y").alias("__true"),
        F.sum(
            F.when(
                F.col("__u") < F.col("__pi"),
                F.when(
                    F.col("__pi") == 0.5, F.col("__y") * 2
                ).otherwise(F.col("__y") * 10),
            ).otherwise(F.lit(0).cast("decimal(12,2)"))
        ).alias("__ht"),
        F.sum(
            F.when(
                F.col("__u") < F.col("__pi"),
                F.when(
                    F.col("__pi") == 0.5,
                    F.col("__y") * F.col("__y") * 2,
                ).otherwise(F.col("__y") * F.col("__y") * 90),
            ).otherwise(F.lit(0).cast("decimal(28,4)"))
        ).alias("__v"),
    )
    return g.select(
        "n_pop",
        "n_sampled",
        F.col("__ht").cast("double").alias("ht_total"),
        F.col("__true").cast("double").alias("true_total"),
        F.round(
            (F.col("__ht") - F.col("__true")).cast("double")
            / F.col("__true").cast("double"),
            round_to,
        ).alias("rel_err"),
        F.round(F.sqrt(F.col("__v").cast("double")), round_to).alias(
            "se_est"
        ),
    )


def horvitz_thompson_total_sql(
    table: str,
    id_col: str,
    y_col: str,
    big_pred_sql: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`horvitz_thompson_total`."""
    u = (
        f"CAST(('0x' || substring(md5(CAST({id_col} AS VARCHAR) || ':ht'), "
        f"1, 15)) AS BIGINT) / {_DENOM!r}"
    )
    return f"""
    WITH base AS (
      SELECT CAST({y_col} AS DECIMAL(12,2)) AS y,
             CASE WHEN {big_pred_sql} THEN 0.5 ELSE 0.1 END AS pi,
             {u} AS u
      FROM {table}
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CASE WHEN u < pi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
             SUM(y) AS true_t,
             SUM(CASE WHEN u < pi
                      THEN CASE WHEN pi = 0.5 THEN y * 2 ELSE y * 10 END
                      ELSE CAST(0 AS DECIMAL(12,2)) END) AS ht,
             SUM(CASE WHEN u < pi
                      THEN CASE WHEN pi = 0.5 THEN y * y * 2
                           ELSE y * y * 90 END
                      ELSE CAST(0 AS DECIMAL(28,4)) END) AS v
      FROM base
    )
    SELECT n_pop, n_sampled,
           CAST(ht AS DOUBLE) AS ht_total,
           CAST(true_t AS DOUBLE) AS true_total,
           ROUND(CAST(ht - true_t AS DOUBLE) / CAST(true_t AS DOUBLE),
                 {round_to}) AS rel_err,
           ROUND(SQRT(CAST(v AS DOUBLE)), {round_to}) AS se_est
    FROM g
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 133: intraclass correlation + Kish design effect
# ──────────────────────────────────────────────────────────────────────────


def icc_design_effect(
    df: DataFrame,
    cluster_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA intraclass correlation ICC(1) and the Kish design
    effect ``deff = 1 + (m̄ - 1)·ICC`` — the number every
    cluster-randomized experiment divides its effective sample size
    by. Events from the same user are correlated; a user-level
    randomization analyzed at the event level overstates n by deff
    (deff = 3 means your million events carry a third of a million
    events' worth of information).

    Estimator (unbalanced one-way ANOVA, n0 = (N - Σm²/N)/(k-1)):
    ``MSB = (Σ S_c²/m_c - G²/N)/(k-1)``,
    ``MSW = (Σy² - Σ S_c²/m_c)/(N-k)``,
    ``ICC = (MSB - MSW)/(MSB + (n0-1)·MSW)``.

    Per-cluster S_c = Σy and Σy² accumulate as exact DECIMAL
    (wave-118); the across-cluster reduction Σ S_c²/m_c is a sum of
    per-cluster rationals — kept as an UNORDERED double sum because
    clusters grow with the corpus (a sorted fold would be a driver-
    side scale-killer); the ROUND targets (icc, deff) are O(1) ratios
    where the summation-order ulp is ~1e-13 relative, far inside the
    6-dp contract.

    Output (one row): (n_obs, n_clusters, mean_cluster_size, icc,
    deff, n_effective).
    """
    yd = F.col(value_col).cast("decimal(18,2)")
    per = df.groupBy(F.col(cluster_col).alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(yd).alias("s"),
        F.sum(yd * yd).alias("q"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("m").cast("bigint").alias("n"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("m2"),
        F.sum("s").alias("g"),
        F.sum("q").alias("qq"),
        F.sum(
            F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("m").cast("double")
        ).alias("ss_c"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    gg = F.col("g").cast("double")
    ssb = F.col("ss_c") - gg * gg / n
    ssw = F.col("qq").cast("double") - F.col("ss_c")
    msb = ssb / (k - F.lit(1.0))
    msw = ssw / (n - k)
    n0 = (n - F.col("m2").cast("double") / n) / (k - F.lit(1.0))
    icc = (msb - msw) / (msb + (n0 - F.lit(1.0)) * msw)
    mbar = n / k
    deff = F.lit(1.0) + (mbar - F.lit(1.0)) * icc
    return agg.select(
        F.col("n").alias("n_obs"),
        F.col("k").alias("n_clusters"),
        F.round(mbar, round_to).alias("mean_cluster_size"),
        F.round(icc, round_to).alias("icc"),
        F.round(deff, round_to).alias("deff"),
        # deff <= 0 happens when the negatively-biased ANOVA estimator
        # bottoms out (ICC -> -1/(m-1)); n_effective is undefined there
        F.round(
            F.when(deff > 0.0, n / deff), round_to
        ).alias("n_effective"),
    )


def icc_design_effect_sql(
    src_sql: str,
    cluster_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`icc_design_effect` (icc/deff staged in a
    CTE so each closed form appears once)."""
    return f"""
    WITH src AS ({src_sql}),
    per AS (
      SELECT {cluster_col} AS c,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS s,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,2))
                      * CAST({value_col} AS DECIMAL(18,2)))
                  AS DECIMAL(36,4)) AS q
      FROM src GROUP BY 1
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * m) AS BIGINT) AS m2,
             CAST(SUM(s) AS DECIMAL(38,2)) AS g,
             CAST(SUM(q) AS DECIMAL(38,4)) AS qq,
             SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(m AS DOUBLE)) AS ss_c
      FROM per
    ),
    ms AS (
      SELECT *,
             (ss_c - CAST(g AS DOUBLE) * CAST(g AS DOUBLE)
                      / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)
               AS msb,
             (CAST(qq AS DOUBLE) - ss_c)
               / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
             (CAST(n AS DOUBLE) - CAST(m2 AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(k AS DOUBLE) - 1.0) AS n0
      FROM agg
    ),
    stats AS (
      SELECT *,
             (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc_v
      FROM ms
    ),
    eff AS (
      SELECT *,
             1.0 + (CAST(n AS DOUBLE) / k - 1.0) * icc_v AS deff_v
      FROM stats
    )
    SELECT n AS n_obs,
           k AS n_clusters,
           ROUND(CAST(n AS DOUBLE) / k, {round_to}) AS mean_cluster_size,
           ROUND(icc_v, {round_to}) AS icc,
           ROUND(deff_v, {round_to}) AS deff,
           ROUND(CASE WHEN deff_v > 0.0
                      THEN CAST(n AS DOUBLE) / deff_v END,
                 {round_to}) AS n_effective
    FROM eff
    """
