"""Wave-57 extension specs: difference-in-differences, CUPED variance
reduction, rolling correlation, tier migration matrix, McNemar test.

Reference scope: all beyond-reference experimentation/BI analytics
(SURVEY §2.13) — DiD/CUPED/McNemar complete the causal-measurement
family started by ratio_metric_ab_test and srm_check_users; the
rolling correlation and tier matrix extend the timeseries/BI layers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import evaluation, segmentation, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "did_aa_estimator",
    evaluation.did_estimator_sql(),
    "causal op — difference-in-differences over an md5 2-arm user "
    "split x corpus time halves (the AA/placebo harness): per-unit "
    "event-count deltas, exact bigint moments end to end, unit-level "
    "SE, zero rounding.",
)
def did_aa_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return evaluation.did_estimator(events)


@_spec(
    "cuped_adjusted_lift",
    evaluation.cuped_adjusted_lift_sql(),
    "causal op — CUPED variance reduction (theta = cov/var from "
    "pooled exact bigint moments; adjusted post metric per unit; "
    "variance-ratio from the CUPED identity) on the same AA split; "
    "the CI-shrinking standard of experimentation platforms.",
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return evaluation.cuped_adjusted_lift(events)


@_spec(
    "rolling_click_purchase_corr",
    timeseries.rolling_correlation_sql(),
    "timeseries op — 14-day rolling Pearson correlation between "
    "click and purchase daily counts: all five windowed moments are "
    "exact bigint rolling sums, one fixed IEEE r per day, zero "
    "rounding; the time-local complement to lagged_cross_correlation.",
)
def rolling_click_purchase_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.rolling_correlation(events)


@_spec(
    "tier_migration_matrix",
    segmentation.tier_migration_matrix_sql(
        "SELECT o_custkey, o_orderdate, o_totalprice FROM orders",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
    ),
    "BI op — customer spend-quintile migration between corpus time "
    "halves (tier 0 = inactive): DECIMAL-exact half spends, "
    "distributed two-phase NTILE with (spend desc, unit) tie order, "
    "exact transition counts.",
)
def tier_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select("o_custkey", "o_orderdate", "o_totalprice")
    return segmentation.tier_migration_matrix(
        src, "o_custkey", "o_orderdate", "o_totalprice"
    )


@_spec(
    "mcnemar_gates",
    evaluation.mcnemar_gates_sql(
        "documents",
        "n_chars >= 300",
        "len(regexp_extract_all(text, '\\S+')) >= 55",
    ),
    "eval op — McNemar paired test between the same two document "
    "gates cohens_kappa_gates scores for agreement: discordant-cell "
    "chi-square + Edwards continuity correction, exact bigint cells, "
    "fixed IEEE statistics.",
)
def mcnemar_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return evaluation.mcnemar_gates(
        docs,
        F.col("n_chars") >= 300,
        F.regexp_count(F.col("text"), F.lit(r"\S+")) >= 55,
    )
