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
