"""M1/M2 — weighted quasi-binomial GLM + coefficient tidy
(run_analysis.Rmd:80-143).

The reference fits ``glm(q2_yes_prop ~ covariates, family=quasibinomial,
weights=response_total)`` and tidies coefficients with CIs/odds ratios.
pyspark.ml's GeneralizedLinearRegression with family='binomial',
link='logit', weightCol gives the same IRLS point estimates
(quasi-binomial differs from binomial only in the variance/dispersion
treatment); we rescale standard errors by sqrt(dispersion) manually —
exactly what R's quasibinomial does (SURVEY §2.12 M1).

Scale note: GLR's IRLS is a sequence of distributed weighted
least-squares passes (one tree-aggregate per iteration over the feature
matrix) — fits on any input a DataFrame scan can feed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class TidyCoef:
    """One tidy() row (run_analysis.Rmd:103-143)."""

    term: str
    estimate: float
    std_error: float  # dispersion-rescaled (quasibinomial)
    statistic: float
    odds_ratio: float  # exponentiate=TRUE form (run_analysis.Rmd:174)
    conf_low: float  # Wald 95% CI on the odds-ratio scale
    conf_high: float


def fit_quasibinomial_glm(
    df: DataFrame,
    response_col: str,
    feature_cols: list[str],
    weight_col: str,
    reg_param: float = 0.0,
):
    """Fit the weighted proportion-response GLM. Returns the fitted
    pyspark.ml model (response in [0,1], weights = trial counts)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="__features", handleInvalid="skip"
    ).transform(df.dropna(subset=[response_col, weight_col]))

    glr = GeneralizedLinearRegression(
        family="binomial",
        link="logit",
        featuresCol="__features",
        labelCol=response_col,
        weightCol=weight_col,
        regParam=reg_param,
    )
    return glr.fit(assembled)


def tidy(model, feature_cols: list[str], quasi: bool = True) -> list[TidyCoef]:
    """broom::tidy-style coefficient table with quasibinomial SE
    rescaling and odds-ratio CIs."""
    s = model.summary
    # dispersion: Pearson chi-sq / df_residual — R's quasibinomial scale
    scale = math.sqrt(s.dispersion) if quasi else 1.0
    terms = feature_cols + ["(Intercept)"]
    out = []
    z975 = 1.959963984540054
    for term, est, se in zip(
        terms,
        list(model.coefficients) + [model.intercept],
        s.coefficientStandardErrors,
    ):
        se_q = se * scale
        out.append(
            TidyCoef(
                term=term,
                estimate=est,
                std_error=se_q,
                statistic=est / se_q if se_q else float("nan"),
                odds_ratio=math.exp(est),
                conf_low=math.exp(est - z975 * se_q),
                conf_high=math.exp(est + z975 * se_q),
            )
        )
    return out
