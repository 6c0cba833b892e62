"""Coarsened Exact Matching (CEM) — observational treatment-effect
estimation by exact matching on COARSENED covariates (Iacus, King &
Porro 2012).

The reference's single inferential model (a weighted GLM,
run_analysis.Rmd:80-99) regresses an outcome on covariates; CEM is the
design-based complement the same analyst reaches for when treatment
assignment is a column, not a coefficient: bin the covariates, keep
only strata containing BOTH treated and control units, reweight
controls to the treated distribution, and difference the means. The
whole estimator is two hash aggregates — ideal Spark shape:

1. unit table -> groupBy(strata) with (n_treated, n_control,
   sum_y_treated, sum_y_control) — one shuffle of O(strata) rows,
   map-side combined; outcome sums stay exact DECIMAL.
2. matched-strata rollup to the reporting key — O(strata) rows.

Nothing is ever matched pairwise (classic 1:NN matching is an O(n^2)
nearest-neighbor join; CEM's strata replace it with a groupBy), which
is exactly why CEM is the form that survives 100 TB.

ATT within the matched set: for stratum s,
``att_s_contrib = sum_y_T_s - (nT_s / nC_s) * sum_y_C_s`` and
``ATT = sum_s att_s_contrib / sum_s nT_s`` — controls are weighted by
``nT_s/nC_s`` so their covariate distribution matches the treated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cem_att(
    units: DataFrame,
    treat_col: str,
    outcome_col: str,
    strata_cols: Sequence[str],
    report_cols: Sequence[str],
    round_to: int = 4,
) -> DataFrame:
    """CEM average-treatment-effect-on-the-treated per reporting key.

    ``units``: one row per unit; ``treat_col`` boolean; ``outcome_col``
    a 2-decimal measure (kept exact as DECIMAL through the sums);
    ``strata_cols`` the coarsened covariates (must include
    ``report_cols`` as a prefix or subset — a stratum never spans two
    reporting groups).

    Output per reporting key: (report_cols..., n_strata_matched,
    n_treated, n_control, att).
    """
    y = F.col(outcome_col).cast("decimal(18,2)")
    t = F.col(treat_col)
    per = units.groupBy(*strata_cols).agg(
        F.sum(F.when(t, 1).otherwise(0)).cast("bigint").alias("__nt"),
        F.sum(F.when(t, 0).otherwise(1)).cast("bigint").alias("__nc"),
        F.sum(F.when(t, y).otherwise(F.lit(0).cast("decimal(18,2)"))).alias("__st"),
        F.sum(F.when(t, F.lit(0).cast("decimal(18,2)")).otherwise(y)).alias("__sc"),
    )
    matched = per.filter((F.col("__nt") > 0) & (F.col("__nc") > 0))
    contrib = F.col("__st").cast("double") - (
        F.col("__nt").cast("double") / F.col("__nc").cast("double")
    ) * F.col("__sc").cast("double")
    out = matched.groupBy(*report_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata_matched"),
        F.sum("__nt").cast("bigint").alias("n_treated"),
        F.sum("__nc").cast("bigint").alias("n_control"),
        F.round(F.sum(contrib) / F.sum("__nt"), round_to).alias("att"),
    )
    return out.orderBy(*report_cols)


def cem_att_sql(
    units_sql: str,
    treat_col: str,
    outcome_col: str,
    strata_cols: Sequence[str],
    report_cols: Sequence[str],
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`cem_att`; ``units_sql`` yields the unit
    table with the same column names."""
    strata = ", ".join(strata_cols)
    report = ", ".join(report_cols)
    return f"""
    WITH units AS ({units_sql}),
    per AS (
      SELECT {strata},
             CAST(SUM(CASE WHEN {treat_col} THEN 1 ELSE 0 END) AS BIGINT)
               AS nt,
             CAST(SUM(CASE WHEN {treat_col} THEN 0 ELSE 1 END) AS BIGINT)
               AS nc,
             SUM(CASE WHEN {treat_col}
                 THEN CAST({outcome_col} AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS st,
             SUM(CASE WHEN {treat_col}
                 THEN CAST(0 AS DECIMAL(18,2))
                 ELSE CAST({outcome_col} AS DECIMAL(18,2)) END) AS sc
      FROM units GROUP BY {strata}
    ),
    matched AS (SELECT * FROM per WHERE nt > 0 AND nc > 0)
    SELECT {report},
           CAST(COUNT(*) AS BIGINT) AS n_strata_matched,
           CAST(SUM(nt) AS BIGINT) AS n_treated,
           CAST(SUM(nc) AS BIGINT) AS n_control,
           ROUND(SUM(CAST(st AS DOUBLE)
                     - (CAST(nt AS DOUBLE) / CAST(nc AS DOUBLE))
                       * CAST(sc AS DOUBLE))
                 / SUM(nt), {round_to}) AS att
    FROM matched
    GROUP BY {report}
    ORDER BY {report}
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 87: inverse-propensity weighting / doubly-robust AIPW with a
# PINNED score — the scoring pass of observational inference, kept
# separate from the fitting pass exactly as production pipelines do.
# ──────────────────────────────────────────────────────────────────────────


def ipw_ate_scored(
    df: DataFrame,
    treat: str,
    outcome: str,
    score_logit: "F.Column",
    mu1: "F.Column",
    mu0: "F.Column",
    trims: Sequence[float] = (0.01, 0.05, 0.10),
    round_to: int = 6,
) -> DataFrame:
    """ATE via Hajek-normalized inverse-propensity weighting AND
    doubly-robust AIPW, across a propensity-trim grid — with the
    propensity given as a pinned LOGIT expression (``score_logit``)
    and the outcome models as pinned mean expressions (``mu1``/
    ``mu0``). Fitting those models is a separate concern (ml/glm.py
    does IRLS); THIS operator is the scoring pass a production
    pipeline runs daily with frozen coefficients, so the whole
    estimator is closed-form scan math both engines reproduce.

      p        = 1/(1+exp(-logit)), clipped to [trim, 1-trim]
      IPW ATE  = Σ(t·y/p)/Σ(t/p) − Σ((1−t)·y/(1−p))/Σ((1−t)/(1−p))
      AIPW ATE = mean[ mu1 − mu0 + t·(y−mu1)/p − (1−t)·(y−mu0)/(1−p) ]
      ESS_t    = (Σ_t w)² / Σ_t w²   (Kish effective sample size)

    The trim grid multiplies one aggregate — each trim level is a
    conditional re-clip of the same scan, not a re-scan. Output per
    trim: (trim, n_treat, n_control, ate_naive, ate_ipw, ate_aipw,
    ess_treat, ess_control), ordered by trim."""
    base = df.select(
        F.col(treat).cast("int").alias("t"),
        F.col(outcome).cast("double").alias("y"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-score_logit))).alias("p_raw"),
        mu1.cast("double").alias("m1"),
        mu0.cast("double").alias("m0"),
    )
    g = base.select(
        "*",
        F.explode(
            F.array(*[F.lit(float(v)) for v in trims])
        ).alias("trim"),
    )
    p = F.least(
        F.greatest(F.col("p_raw"), F.col("trim")),
        F.lit(1.0) - F.col("trim"),
    )
    tt = F.col("t").cast("double")
    w_t = tt / p
    w_c = (F.lit(1.0) - tt) / (F.lit(1.0) - p)
    aipw_term = (
        F.col("m1")
        - F.col("m0")
        + tt * (F.col("y") - F.col("m1")) / p
        - (F.lit(1.0) - tt) * (F.col("y") - F.col("m0")) / (F.lit(1.0) - p)
    )
    agg = g.groupBy("trim").agg(
        F.sum("t").cast("bigint").alias("n_treat"),
        (F.count(F.lit(1)) - F.sum("t")).cast("bigint").alias("n_control"),
        F.sum(tt * F.col("y")).alias("sy_t"),
        F.sum((F.lit(1.0) - tt) * F.col("y")).alias("sy_c"),
        F.sum(w_t * F.col("y")).alias("swy_t"),
        F.sum(w_c * F.col("y")).alias("swy_c"),
        F.sum(w_t).alias("sw_t"),
        F.sum(w_c).alias("sw_c"),
        F.sum(w_t * w_t).alias("sw2_t"),
        F.sum(w_c * w_c).alias("sw2_c"),
        F.avg(aipw_term).alias("aipw"),
    )
    naive = F.col("sy_t") / F.col("n_treat").cast("double") - F.col(
        "sy_c"
    ) / F.col("n_control").cast("double")
    ipw = F.col("swy_t") / F.col("sw_t") - F.col("swy_c") / F.col("sw_c")
    return agg.select(
        F.col("trim"),
        "n_treat",
        "n_control",
        F.round(naive, round_to).alias("ate_naive"),
        F.round(ipw, round_to).alias("ate_ipw"),
        F.round(F.col("aipw"), round_to).alias("ate_aipw"),
        F.round(
            F.col("sw_t") * F.col("sw_t") / F.col("sw2_t"), round_to
        ).alias("ess_treat"),
        F.round(
            F.col("sw_c") * F.col("sw_c") / F.col("sw2_c"), round_to
        ).alias("ess_control"),
    ).orderBy("trim")


def ipw_ate_scored_sql(
    source_sql: str,
    treat: str,
    outcome: str,
    score_logit_sql: str,
    mu1_sql: str,
    mu0_sql: str,
    trims: Sequence[float] = (0.01, 0.05, 0.10),
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`ipw_ate_scored` (identical formula order)."""
    values = ", ".join(f"({float(v)!r})" for v in trims)
    return f"""
    WITH src AS ({source_sql}),
    base AS (
      SELECT CAST({treat} AS INTEGER) AS t,
             CAST({outcome} AS DOUBLE) AS y,
             1.0 / (1.0 + EXP(-({score_logit_sql}))) AS p_raw,
             CAST({mu1_sql} AS DOUBLE) AS m1,
             CAST({mu0_sql} AS DOUBLE) AS m0
      FROM src
    ),
    g AS (
      SELECT base.*, CAST(tr.trim AS DOUBLE) AS trim
      FROM base CROSS JOIN (VALUES {values}) AS tr(trim)
    ),
    w AS (
      SELECT trim, t, y, m1, m0,
             LEAST(GREATEST(p_raw, trim), 1.0 - trim) AS p
      FROM g
    ),
    agg AS (
      SELECT trim,
             CAST(SUM(t) AS BIGINT) AS n_treat,
             CAST(COUNT(*) - SUM(t) AS BIGINT) AS n_control,
             SUM(CAST(t AS DOUBLE) * y) AS sy_t,
             SUM((1.0 - CAST(t AS DOUBLE)) * y) AS sy_c,
             SUM(CAST(t AS DOUBLE) / p * y) AS swy_t,
             SUM((1.0 - CAST(t AS DOUBLE)) / (1.0 - p) * y) AS swy_c,
             SUM(CAST(t AS DOUBLE) / p) AS sw_t,
             SUM((1.0 - CAST(t AS DOUBLE)) / (1.0 - p)) AS sw_c,
             SUM((CAST(t AS DOUBLE) / p) * (CAST(t AS DOUBLE) / p))
               AS sw2_t,
             SUM(((1.0 - CAST(t AS DOUBLE)) / (1.0 - p))
                 * ((1.0 - CAST(t AS DOUBLE)) / (1.0 - p))) AS sw2_c,
             AVG(m1 - m0 + CAST(t AS DOUBLE) * (y - m1) / p
                 - (1.0 - CAST(t AS DOUBLE)) * (y - m0) / (1.0 - p))
               AS aipw
      FROM w GROUP BY trim
    )
    SELECT trim,
           n_treat, n_control,
           ROUND(sy_t / CAST(n_treat AS DOUBLE)
                 - sy_c / CAST(n_control AS DOUBLE), {round_to})
             AS ate_naive,
           ROUND(swy_t / sw_t - swy_c / sw_c, {round_to}) AS ate_ipw,
           ROUND(aipw, {round_to}) AS ate_aipw,
           ROUND(sw_t * sw_t / sw2_t, {round_to}) AS ess_treat,
           ROUND(sw_c * sw_c / sw2_c, {round_to}) AS ess_control
    FROM agg ORDER BY trim
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 132: two-period difference-in-differences
# ──────────────────────────────────────────────────────────────────────────


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    post_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-group / two-period difference-in-differences — the workhorse
    quasi-experimental estimator the causal family (cem_att: matching;
    ipw_ate: weighting) lacked: with ``D = (ȳ_T,post − ȳ_T,pre) −
    (ȳ_C,post − ȳ_C,pre)``, time-invariant group differences and
    group-invariant time shocks both cancel; D equals the OLS
    interaction coefficient of y ~ group*post. The Welch-style SE from
    the four cell variances gives the usual z for the effect.

    Determinism discipline (wave 118): values enter as exact
    DECIMAL(18,2) — cell sums Σy and Σy² accumulate exactly in any
    order; the four cell means/variances and the final D/SE are a
    fixed closed form on those exact sums. ONE aggregate over the fact
    table (4 conditional sum-triples), everything after is one row.

    Output (one row): (n_obs, did_effect, se, z_stat,
    pre_gap, post_gap) — pre_gap is the parallel-trends eyeball:
    a large pre-period group gap is fine, but the IDENTIFYING
    assumption is that it would have stayed constant.
    """
    g = F.col(group_col).cast("boolean")
    p = F.col(post_col).cast("boolean")
    yd = F.col(value_col).cast("decimal(18,2)")
    cells = []
    for name, cond in (
        ("tpre", g & ~p), ("tpost", g & p),
        ("cpre", ~g & ~p), ("cpost", ~g & p),
    ):
        yc = F.when(cond, yd)
        cells += [
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"n_{name}"),
            F.sum(yc).alias(f"s_{name}"),
            F.sum(yc * yd).alias(f"q_{name}"),
        ]
    agg = df.agg(*cells)

    def _mean(name):
        return F.col(f"s_{name}").cast("double") / F.col(f"n_{name}").cast(
            "double"
        )

    def _var(name):
        n = F.col(f"n_{name}").cast("double")
        s = F.col(f"s_{name}").cast("double")
        return (
            (F.col(f"q_{name}").cast("double") - s * s / n) / (n - F.lit(1.0))
        )

    did = (_mean("tpost") - _mean("tpre")) - (_mean("cpost") - _mean("cpre"))
    se = F.sqrt(
        _var("tpost") / F.col("n_tpost").cast("double")
        + _var("tpre") / F.col("n_tpre").cast("double")
        + _var("cpost") / F.col("n_cpost").cast("double")
        + _var("cpre") / F.col("n_cpre").cast("double")
    )
    n_obs = (
        F.col("n_tpre") + F.col("n_tpost") + F.col("n_cpre") + F.col("n_cpost")
    ).cast("bigint")
    return agg.select(
        n_obs.alias("n_obs"),
        F.round(did, round_to).alias("did_effect"),
        F.round(se, round_to).alias("se"),
        F.round(did / se, round_to).alias("z_stat"),
        F.round(_mean("tpre") - _mean("cpre"), round_to).alias("pre_gap"),
        F.round(_mean("tpost") - _mean("cpost"), round_to).alias("post_gap"),
    )


def diff_in_diff_sql(
    src_sql: str,
    group_col: str,
    post_col: str,
    value_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`diff_in_diff` (same DECIMAL cell sums,
    same closed-form order)."""

    def _cell(name, cond):
        return (
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{name},\n"
            f"      SUM(CASE WHEN {cond} THEN y END) AS s_{name},\n"
            f"      SUM(CASE WHEN {cond} THEN y END * y) AS q_{name}"
        )

    def _mean(name):
        return f"(CAST(s_{name} AS DOUBLE) / CAST(n_{name} AS DOUBLE))"

    def _var(name):
        n = f"CAST(n_{name} AS DOUBLE)"
        s = f"CAST(s_{name} AS DOUBLE)"
        return (
            f"((CAST(q_{name} AS DOUBLE) - {s} * {s} / {n}) / ({n} - 1.0))"
        )

    did = (
        f"(({_mean('tpost')} - {_mean('tpre')})"
        f" - ({_mean('cpost')} - {_mean('cpre')}))"
    )
    se = (
        f"sqrt({_var('tpost')} / CAST(n_tpost AS DOUBLE)"
        f" + {_var('tpre')} / CAST(n_tpre AS DOUBLE)"
        f" + {_var('cpost')} / CAST(n_cpost AS DOUBLE)"
        f" + {_var('cpre')} / CAST(n_cpre AS DOUBLE))"
    )
    g, p = f"({group_col})", f"({post_col})"
    return f"""
    WITH src AS ({src_sql}),
    pts AS (
      SELECT {g} AS g, {p} AS p,
             CAST({value_col} AS DECIMAL(18,2)) AS y
      FROM src
    ),
    agg AS (
      SELECT {_cell('tpre', 'g AND NOT p')},
             {_cell('tpost', 'g AND p')},
             {_cell('cpre', 'NOT g AND NOT p')},
             {_cell('cpost', 'NOT g AND p')}
      FROM pts
    )
    SELECT CAST(n_tpre + n_tpost + n_cpre + n_cpost AS BIGINT) AS n_obs,
           ROUND({did}, {round_to}) AS did_effect,
           ROUND({se}, {round_to}) AS se,
           ROUND({did} / {se}, {round_to}) AS z_stat,
           ROUND({_mean('tpre')} - {_mean('cpre')}, {round_to}) AS pre_gap,
           ROUND({_mean('tpost')} - {_mean('cpost')}, {round_to}) AS post_gap
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 149: sharp regression-discontinuity estimator
# ──────────────────────────────────────────────────────────────────────────


def rdd_sharp(
    df: DataFrame,
    running_col: str,
    outcome_col: str,
    cutoff: float,
    bandwidth: float,
    round_to: int = 6,
) -> DataFrame:
    """Sharp regression-discontinuity estimate: local LINEAR fits on
    each side of the cutoff within a fixed bandwidth, effect = the
    jump between the two intercepts AT the cutoff,

      left:  x ∈ [c−h, c),  right: x ∈ [c, c+h];
      per side OLS  y = a + b·(x−c);   τ = a_R − a_L;
      SE(τ)² = Var(a_R) + Var(a_L),
      Var(a) = σ̂²·(1/n + x̄²/S_xx),  σ̂² = SSE/(n−2)

    — the uniform-kernel local-linear form (Imbens & Lemieux 2008),
    the observational-jump sibling of diff_in_diff (which needs a
    control group; RDD substitutes the continuity assumption).

    Exactness ledger (the chow/segmented discipline): the running
    variable contract is integer-or-2-decimal, the outcome is
    DECIMAL(18,2), so every per-side moment (n, Σd, Σd², Σy, Σdy,
    Σy² — d = x−c at 2 decimals) is an exact DECIMAL conditional sum
    — order-free at any partitioning; only the closed-form
    intercepts/variances run in double, identical shapes in both
    engines. One conditional aggregate over the banded scan —
    filters push to the parquet scan, O(rows in band) with no
    shuffle beyond the 1-row reduction.

    Output (one row): (n_left, n_right, slope_left, slope_right,
    effect, t_stat).
    """
    c = float(cutoff)
    h = float(bandwidth)
    d = (
        F.col(running_col).cast("decimal(18,2)")
        - F.lit(c).cast("decimal(18,2)")
    ).cast("decimal(18,2)")
    y = F.col(outcome_col).cast("decimal(18,2)")
    left = (F.col(running_col) >= c - h) & (F.col(running_col) < c)
    right = (F.col(running_col) >= c) & (F.col(running_col) <= c + h)
    zero2 = F.lit(0).cast("decimal(18,2)")
    zero4 = F.lit(0).cast("decimal(38,4)")

    def _side(tag: str, cond):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(
                f"n_{tag}"
            ),
            F.sum(F.when(cond, d).otherwise(zero2)).alias(f"sd_{tag}"),
            F.sum(F.when(cond, d * d).otherwise(zero4)).alias(
                f"sdd_{tag}"
            ),
            F.sum(F.when(cond, y).otherwise(zero2)).alias(f"sy_{tag}"),
            F.sum(F.when(cond, d * y).otherwise(zero4)).alias(
                f"sdy_{tag}"
            ),
            F.sum(F.when(cond, y * y).otherwise(zero4)).alias(
                f"syy_{tag}"
            ),
        ]

    agg = df.filter(left | right).agg(*_side("l", left), *_side("r", right))

    def _fit(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        sd = F.col(f"sd_{tag}").cast("double")
        sdd = F.col(f"sdd_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        sdy = F.col(f"sdy_{tag}").cast("double")
        syy = F.col(f"syy_{tag}").cast("double")
        sxx = sdd - sd * sd / n
        sxy = sdy - sd * sy / n
        syy_c = syy - sy * sy / n
        b = sxy / sxx
        a = sy / n - b * (sd / n)
        sse = syy_c - b * sxy
        var_a = (sse / (n - 2.0)) * (1.0 / n + (sd / n) * (sd / n) / sxx)
        return b, a, var_a

    b_l, a_l, v_l = _fit("l")
    b_r, a_r, v_r = _fit("r")
    tau = a_r - a_l
    # degenerate exact fits (SSE = 0 both sides) have no sampling
    # noise to test against: t_stat is NULL, same contract in the twin
    t_stat = F.when(
        v_l + v_r > 0, F.round(tau / F.sqrt(v_l + v_r), round_to)
    )
    return agg.select(
        F.col("n_l").alias("n_left"),
        F.col("n_r").alias("n_right"),
        F.round(b_l, round_to).alias("slope_left"),
        F.round(b_r, round_to).alias("slope_right"),
        F.round(tau, round_to).alias("effect"),
        t_stat.alias("t_stat"),
    )


def rdd_sharp_sql(
    src_sql: str,
    running_col: str,
    outcome_col: str,
    cutoff: float,
    bandwidth: float,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`rdd_sharp` (same DECIMAL conditional
    sums, same closed-form order)."""
    c, h = float(cutoff), float(bandwidth)
    d = f"(CAST({running_col} AS DECIMAL(18,2)) - {c!r})"
    y = f"CAST({outcome_col} AS DECIMAL(18,2))"
    left = f"({running_col} >= {c - h!r} AND {running_col} < {c!r})"
    right = f"({running_col} >= {c!r} AND {running_col} <= {c + h!r})"

    def _side(tag, cond):
        z2 = "CAST(0 AS DECIMAL(18,2))"
        z4 = "CAST(0 AS DECIMAL(38,4))"
        return f"""
             CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_{tag},
             SUM(CASE WHEN {cond} THEN {d} ELSE {z2} END) AS sd_{tag},
             SUM(CASE WHEN {cond} THEN {d} * {d} ELSE {z4} END)
               AS sdd_{tag},
             SUM(CASE WHEN {cond} THEN {y} ELSE {z2} END) AS sy_{tag},
             SUM(CASE WHEN {cond} THEN {d} * {y} ELSE {z4} END)
               AS sdy_{tag},
             SUM(CASE WHEN {cond} THEN {y} * {y} ELSE {z4} END)
               AS syy_{tag}"""

    def _fit(tag):
        n = f"CAST(n_{tag} AS DOUBLE)"
        sd = f"CAST(sd_{tag} AS DOUBLE)"
        sdd = f"CAST(sdd_{tag} AS DOUBLE)"
        sy = f"CAST(sy_{tag} AS DOUBLE)"
        sdy = f"CAST(sdy_{tag} AS DOUBLE)"
        syy = f"CAST(syy_{tag} AS DOUBLE)"
        sxx = f"({sdd} - {sd} * {sd} / {n})"
        sxy = f"({sdy} - {sd} * {sy} / {n})"
        syyc = f"({syy} - {sy} * {sy} / {n})"
        b = f"({sxy} / {sxx})"
        a = f"({sy} / {n} - {b} * ({sd} / {n}))"
        var_a = (
            f"((({syyc} - {b} * {sxy}) / ({n} - 2.0))"
            f" * (1.0 / {n} + ({sd} / {n}) * ({sd} / {n}) / {sxx}))"
        )
        return b, a, var_a

    b_l, a_l, v_l = _fit("l")
    b_r, a_r, v_r = _fit("r")
    return f"""
    WITH src AS ({src_sql}),
    agg AS (
      SELECT {_side('l', left)},
             {_side('r', right)}
      FROM src WHERE {left} OR {right}
    )
    SELECT n_l AS n_left,
           n_r AS n_right,
           ROUND({b_l}, {round_to}) AS slope_left,
           ROUND({b_r}, {round_to}) AS slope_right,
           ROUND({a_r} - {a_l}, {round_to}) AS effect,
           CASE WHEN {v_l} + {v_r} > 0
                THEN ROUND(({a_r} - {a_l}) / SQRT({v_l} + {v_r}),
                           {round_to})
           END AS t_stat
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 150: just-identified IV / two-stage least squares
# ──────────────────────────────────────────────────────────────────────────


def iv_2sls(
    df: DataFrame,
    outcome_col: str,
    endog_col: str,
    instrument_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Just-identified instrumental-variables estimate (one endogenous
    regressor x, one instrument z, intercepts):

      ``β_IV = Cov(z,y) / Cov(z,x)``  (the Wald/2SLS coincidence in
      the just-identified case), ``α = ȳ − β_IV·x̄``;
      first-stage strength ``F = t²`` from OLS x ~ z;
      ``Var(β_IV) = σ̂_u²·S_zz / S_zx²`` with
      ``σ̂_u² = (S_yy − 2β S_xy + β² S_xx)/(n−2)`` (structural
      residuals through the ORIGINAL x, the 2SLS convention).

    β_OLS is emitted alongside β_IV: the bias gap between them IS the
    diagnostic this estimator exists for (diff_in_diff needs a
    pre-period, rdd_sharp needs a cutoff; IV needs only exogeneity of
    z). Exactness: nine raw moments (n, Σx, Σy, Σz, Σx², Σy², Σz²,
    Σxy, Σxz, Σzy) accumulate as exact DECIMAL sums of 2-decimal
    inputs — order-free; every estimate is a fixed closed form on
    their bit-identical double casts, identical shape in the twin.
    One aggregate over the scan, O(rows), no shuffle beyond the 1-row
    reduction.

    Output (one row): (n, beta_ols, beta_iv, alpha_iv,
    first_stage_f, t_iv).
    """
    x = F.col(endog_col).cast("decimal(18,2)")
    y = F.col(outcome_col).cast("decimal(18,2)")
    z = F.col(instrument_col).cast("decimal(18,2)")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(z).alias("sz"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(z * z).alias("szz"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * z).alias("sxz"),
        F.sum(z * y).alias("szy"),
    )
    n = F.col("n").cast("double")
    sx, sy, sz = (F.col(c).cast("double") for c in ("sx", "sy", "sz"))
    sxx, syy, szz = (
        F.col(c).cast("double") for c in ("sxx", "syy", "szz")
    )
    sxy, sxz, szy = (
        F.col(c).cast("double") for c in ("sxy", "sxz", "szy")
    )
    cxx = sxx - sx * sx / n
    cyy = syy - sy * sy / n
    czz = szz - sz * sz / n
    cxy = sxy - sx * sy / n
    czx = sxz - sz * sx / n
    czy = szy - sz * sy / n
    beta_ols = cxy / cxx
    beta_iv = czy / czx
    alpha_iv = sy / n - beta_iv * (sx / n)
    b1 = czx / czz
    fs_f = (
        b1 * b1 * czz / ((cxx - b1 * b1 * czz) / (n - 2.0))
    )
    su2 = (cyy - 2.0 * beta_iv * cxy + beta_iv * beta_iv * cxx) / (
        n - 2.0
    )
    t_iv = beta_iv / F.sqrt(su2 * czz / (czx * czx))
    return agg.select(
        "n",
        F.round(beta_ols, round_to).alias("beta_ols"),
        F.round(beta_iv, round_to).alias("beta_iv"),
        F.round(alpha_iv, round_to).alias("alpha_iv"),
        F.round(fs_f, round_to).alias("first_stage_f"),
        F.round(t_iv, round_to).alias("t_iv"),
    )


def iv_2sls_sql(
    src_sql: str,
    outcome_col: str,
    endog_col: str,
    instrument_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`iv_2sls` (same DECIMAL moments, same
    closed-form order)."""
    x = f"CAST({endog_col} AS DECIMAL(18,2))"
    y = f"CAST({outcome_col} AS DECIMAL(18,2))"
    z = f"CAST({instrument_col} AS DECIMAL(18,2))"
    return f"""
    WITH src AS ({src_sql}),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM({x}) AS sx, SUM({y}) AS sy, SUM({z}) AS sz,
             SUM({x} * {x}) AS sxx, SUM({y} * {y}) AS syy,
             SUM({z} * {z}) AS szz,
             SUM({x} * {y}) AS sxy, SUM({x} * {z}) AS sxz,
             SUM({z} * {y}) AS szy
      FROM src
    ),
    cen AS (
      SELECT n,
             CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
             CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE) AS cxx,
             CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                 / CAST(n AS DOUBLE) AS cyy,
             CAST(szz AS DOUBLE)
               - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                 / CAST(n AS DOUBLE) AS czz,
             CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                 / CAST(n AS DOUBLE) AS cxy,
             CAST(sxz AS DOUBLE)
               - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE) AS czx,
             CAST(szy AS DOUBLE)
               - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE)
                 / CAST(n AS DOUBLE) AS czy
      FROM agg
    ),
    fit AS (
      SELECT n, sx, sy, cxx, cyy, czz, cxy, czx, czy,
             cxy / cxx AS beta_ols,
             czy / czx AS beta_iv,
             czx / czz AS b1
      FROM cen
    )
    SELECT n,
           ROUND(beta_ols, {round_to}) AS beta_ols,
           ROUND(beta_iv, {round_to}) AS beta_iv,
           ROUND(sy / CAST(n AS DOUBLE)
                 - beta_iv * (sx / CAST(n AS DOUBLE)),
                 {round_to}) AS alpha_iv,
           ROUND(b1 * b1 * czz
                 / ((cxx - b1 * b1 * czz) / (CAST(n AS DOUBLE) - 2.0)),
                 {round_to}) AS first_stage_f,
           ROUND(beta_iv
                 / SQRT(((cyy - 2.0 * beta_iv * cxy
                          + beta_iv * beta_iv * cxx)
                         / (CAST(n AS DOUBLE) - 2.0))
                        * czz / (czx * czx)),
                 {round_to}) AS t_iv
    FROM fit
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 165: IPS / SNIPS off-policy evaluation
# ──────────────────────────────────────────────────────────────────────────


def offpolicy_eval(
    df: DataFrame,
    action_col: str,
    propensity_col: str,
    reward_col: str,
    target_action_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Off-policy evaluation of a TARGET decision policy from logged
    bandit feedback (action, logging propensity, reward) — "what
    would the new ranking/routing policy have earned on last month's
    traffic?", answered WITHOUT an experiment:

      w_i     = 1[π(x_i) = a_i] / p_i            (importance weight)
      V_IPS   = (1/n) Σ w_i·r_i                  (unbiased, high var)
      V_SNIPS = Σ w_i·r_i / Σ w_i                (self-normalized —
                trades a vanishing bias for a large variance cut)
      ESS     = (Σ w)² / Σ w²                    (Kish; how much of
                the log the target policy can actually SEE)

    The logged-bandit sibling of :func:`ipw_ate_scored` (two fixed
    arms there; an arbitrary action space and an explicit target
    policy here). V_behavior = mean logged reward anchors the
    comparison. One aggregate over the scan; every estimate is a
    closed form of six sums; weights and rewards are O(1/p_min)-
    bounded doubles so the unordered sums sit far from any rounding
    grain.

    Output (one row): (n, n_matched, ess, v_behavior, v_ips,
    v_snips).
    """
    match = F.col(target_action_col) == F.col(action_col)
    w = F.when(match, 1.0 / F.col(propensity_col).cast("double")).otherwise(
        0.0
    )
    r = F.col(reward_col).cast("double")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(match.cast("long")).cast("bigint").alias("n_matched"),
        F.sum(w).alias("sw"),
        F.sum(w * w).alias("sw2"),
        F.sum(w * r).alias("swr"),
        F.sum(r).alias("sr"),
    )
    nn = F.col("n").cast("double")
    return agg.select(
        "n",
        "n_matched",
        F.round(
            F.col("sw") * F.col("sw") / F.col("sw2"), round_to
        ).alias("ess"),
        F.round(F.col("sr") / nn, round_to).alias("v_behavior"),
        F.round(F.col("swr") / nn, round_to).alias("v_ips"),
        F.round(F.col("swr") / F.col("sw"), round_to).alias("v_snips"),
    )


def offpolicy_eval_sql(
    src_sql: str,
    action_col: str,
    propensity_col: str,
    reward_col: str,
    target_action_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`offpolicy_eval`."""
    w = (
        f"CASE WHEN {target_action_col} = {action_col}"
        f" THEN 1.0 / CAST({propensity_col} AS DOUBLE) ELSE 0.0 END"
    )
    r = f"CAST({reward_col} AS DOUBLE)"
    return f"""
    WITH src AS ({src_sql}),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {target_action_col} = {action_col}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
             SUM({w}) AS sw,
             SUM(({w}) * ({w})) AS sw2,
             SUM(({w}) * ({r})) AS swr,
             SUM({r}) AS sr
      FROM src
    )
    SELECT n, n_matched,
           ROUND(sw * sw / sw2, {round_to}) AS ess,
           ROUND(sr / CAST(n AS DOUBLE), {round_to}) AS v_behavior,
           ROUND(swr / CAST(n AS DOUBLE), {round_to}) AS v_ips,
           ROUND(swr / sw, {round_to}) AS v_snips
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 168: mediation analysis (product of coefficients + Sobel test)
# ──────────────────────────────────────────────────────────────────────────


def mediation_sobel(
    df: DataFrame,
    x_col: str,
    m_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Classical mediation decomposition (Baron & Kenny 1986) with
    the Sobel (1982) test — HOW does x move y: through the mediator
    m, or directly?

      a  = slope of m ~ x;           b, c' = slopes of y ~ m + x;
      indirect = a·b;  total = c' + a·b;
      prop_mediated = a·b / total;
      Sobel z = a·b / sqrt(b²·SE_a² + a²·SE_b²).

    The mechanism question the rest of the causal family leaves open:
    DiD/RDD/IV estimate THAT x moves y; this splits the path. Both
    regressions are closed forms over nine exact DECIMAL moments
    (the iv_2sls discipline — one aggregate, a k=2 normal-equation
    inverse written out, identical expression shapes in the twin).

    Output (one row): (n, a, b, c_prime, indirect, prop_mediated,
    sobel_z).
    """
    x = F.col(x_col).cast("decimal(18,2)")
    m = F.col(m_col).cast("decimal(18,2)")
    y = F.col(y_col).cast("decimal(18,2)")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(m).alias("sm"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(m * m).alias("smm"),
        F.sum(y * y).alias("syy"),
        F.sum(x * m).alias("sxm"),
        F.sum(x * y).alias("sxy"),
        F.sum(m * y).alias("smy"),
    )
    n = F.col("n").cast("double")
    sx, sm, sy = (F.col(c).cast("double") for c in ("sx", "sm", "sy"))
    sxx, smm, syy = (
        F.col(c).cast("double") for c in ("sxx", "smm", "syy")
    )
    sxm, sxy, smy = (
        F.col(c).cast("double") for c in ("sxm", "sxy", "smy")
    )
    cxx = sxx - sx * sx / n
    cmm = smm - sm * sm / n
    cyy = syy - sy * sy / n
    cxm = sxm - sx * sm / n
    cxy = sxy - sx * sy / n
    cmy = smy - sm * sy / n
    a = cxm / cxx
    se_a = F.sqrt(((cmm - a * cxm) / (n - 2.0)) / cxx)
    den = cmm * cxx - cxm * cxm
    b = (cmy * cxx - cxy * cxm) / den
    cp = (cxy * cmm - cmy * cxm) / den
    sse = cyy - b * cmy - cp * cxy
    s2 = sse / (n - 3.0)
    se_b = F.sqrt(s2 * cxx / den)
    indirect = a * b
    sobel = indirect / F.sqrt(
        b * b * se_a * se_a + a * a * se_b * se_b
    )
    return agg.select(
        "n",
        F.round(a, round_to).alias("a"),
        F.round(b, round_to).alias("b"),
        F.round(cp, round_to).alias("c_prime"),
        F.round(indirect, round_to).alias("indirect"),
        F.round(indirect / (cp + indirect), round_to).alias(
            "prop_mediated"
        ),
        F.round(sobel, round_to).alias("sobel_z"),
    )


def mediation_sobel_sql(
    src_sql: str,
    x_col: str,
    m_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`mediation_sobel` (same moments, same
    closed-form order)."""
    x = f"CAST({x_col} AS DECIMAL(18,2))"
    m = f"CAST({m_col} AS DECIMAL(18,2))"
    y = f"CAST({y_col} AS DECIMAL(18,2))"
    return f"""
    WITH src AS ({src_sql}),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM({x}) AS sx, SUM({m}) AS sm, SUM({y}) AS sy,
             SUM({x} * {x}) AS sxx, SUM({m} * {m}) AS smm,
             SUM({y} * {y}) AS syy,
             SUM({x} * {m}) AS sxm, SUM({x} * {y}) AS sxy,
             SUM({m} * {y}) AS smy
      FROM src
    ),
    cen AS (
      SELECT n,
             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS cxx,
             CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
               * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS cmm,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
             CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS cxm,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cxy,
             CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cmy
      FROM agg
    ),
    fit AS (
      SELECT n, cxx, cmm, cyy, cxm, cxy, cmy,
             cxm / cxx AS a,
             SQRT(((cmm - (cxm / cxx) * cxm) / (CAST(n AS DOUBLE) - 2.0))
                  / cxx) AS se_a,
             (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm) AS b,
             (cxy * cmm - cmy * cxm) / (cmm * cxx - cxm * cxm) AS cp
      FROM cen
    ),
    se AS (
      SELECT *,
             SQRT(((cyy - b * cmy - cp * cxy)
                   / (CAST(n AS DOUBLE) - 3.0))
                  * cxx / (cmm * cxx - cxm * cxm)) AS se_b
      FROM fit
    )
    SELECT n,
           ROUND(a, {round_to}) AS a,
           ROUND(b, {round_to}) AS b,
           ROUND(cp, {round_to}) AS c_prime,
           ROUND(a * b, {round_to}) AS indirect,
           ROUND(a * b / (cp + a * b), {round_to}) AS prop_mediated,
           ROUND(a * b / SQRT(b * b * se_a * se_a
                              + a * a * se_b * se_b),
                 {round_to}) AS sobel_z
    FROM se
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 170: doubly-robust off-policy evaluation
# ──────────────────────────────────────────────────────────────────────────


def dr_offpolicy_eval(
    df: DataFrame,
    action_col: str,
    propensity_col: str,
    reward_col: str,
    target_action_col: str,
    mu_target_col: str,
    mu_logged_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Doubly-robust off-policy value (Dudík, Langford & Li 2011) —
    the estimator that completes :func:`offpolicy_eval`'s IPS/SNIPS
    pair with a reward MODEL, and stays consistent if EITHER the
    model or the propensities are right:

      V_DR = (1/n) Σ [ μ(x_i, π(x_i))
                       + w_i · (r_i − μ(x_i, a_i)) ],
      w_i  = 1[π(x_i) = a_i] / p_i.

    ``mu_target_col`` carries μ(x, π(x)) and ``mu_logged_col``
    μ(x, a) as PINNED columns — the scoring-pass convention of
    ipw_ate_scored: fitting μ is a separate concern; this is the
    estimator a pipeline runs daily with frozen coefficients. The
    direct-method value V_DM = mean μ(x, π(x)) is emitted beside it:
    when the model is biased, DM inherits the bias and DR's
    correction removes it (the property the wave test plants), and
    when the propensities are junk, DR leans on the model — that
    two-sided insurance is the estimator's whole case. One aggregate
    of five sums.

    Output (one row): (n, n_matched, v_dm, v_ips, v_dr).
    """
    match = F.col(target_action_col) == F.col(action_col)
    w = F.when(
        match, 1.0 / F.col(propensity_col).cast("double")
    ).otherwise(0.0)
    r = F.col(reward_col).cast("double")
    mu_t = F.col(mu_target_col).cast("double")
    mu_l = F.col(mu_logged_col).cast("double")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(match.cast("long")).cast("bigint").alias("n_matched"),
        F.sum(mu_t).alias("smt"),
        F.sum(w * r).alias("swr"),
        F.sum(w * mu_l).alias("swm"),
    )
    nn = F.col("n").cast("double")
    return agg.select(
        "n",
        "n_matched",
        F.round(F.col("smt") / nn, round_to).alias("v_dm"),
        F.round(F.col("swr") / nn, round_to).alias("v_ips"),
        F.round(
            (F.col("smt") + F.col("swr") - F.col("swm")) / nn, round_to
        ).alias("v_dr"),
    )


def dr_offpolicy_eval_sql(
    src_sql: str,
    action_col: str,
    propensity_col: str,
    reward_col: str,
    target_action_col: str,
    mu_target_expr: str,
    mu_logged_expr: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`dr_offpolicy_eval`."""
    w = (
        f"CASE WHEN {target_action_col} = {action_col}"
        f" THEN 1.0 / CAST({propensity_col} AS DOUBLE) ELSE 0.0 END"
    )
    return f"""
    WITH src AS ({src_sql}),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {target_action_col} = {action_col}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
             SUM(CAST({mu_target_expr} AS DOUBLE)) AS smt,
             SUM(({w}) * CAST({reward_col} AS DOUBLE)) AS swr,
             SUM(({w}) * CAST({mu_logged_expr} AS DOUBLE)) AS swm
      FROM src
    )
    SELECT n, n_matched,
           ROUND(smt / CAST(n AS DOUBLE), {round_to}) AS v_dm,
           ROUND(swr / CAST(n AS DOUBLE), {round_to}) AS v_ips,
           ROUND((smt + swr - swm) / CAST(n AS DOUBLE), {round_to})
             AS v_dr
    FROM agg
    """
