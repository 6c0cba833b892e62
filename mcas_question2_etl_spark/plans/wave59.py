"""Wave-59 extension specs: embedding norm audit, embedding dimension
variance, OOV rate, Weibull lifetime fit, Gumbel return levels.

Reference scope: all beyond-reference (SURVEY §2.13) — the embedding
audits extend the vector/ANN family's input gates, OOV extends the
train/eval split QA, Weibull/Gumbel give the survival and timeseries
families their parametric summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import similarity, survival, text, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "embedding_norm_audit",
    similarity.embedding_norm_audit_sql(),
    "vector op — per-label L2-norm audit: Q20 fixed-point squared "
    "norms are exact bigints, min/max and the near-unit count compare "
    "on bit-identical doubles, only the mean rounds; the un-"
    "normalized-vector gate ANN correctness depends on.",
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_norm_audit(emb)


@_spec(
    "embedding_dim_variance",
    similarity.embedding_dim_variance_sql(),
    "vector op — per-dimension variance profile over Q20-quantized "
    "integers (exact power sums, fixed IEEE variance, exact near-"
    "zero flag); the dead-dimension detector for index/whitening "
    "hygiene.",
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_dim_variance(emb)


@_spec(
    "oov_rate_by_source",
    text.oov_rate_by_source_sql(),
    "corpus op — out-of-vocabulary occurrence rate per source with "
    "the vocabulary built from the first id-half (train): exact "
    "bigint counts, anti-join on the token key, one division; the "
    "vocab-coverage gate for train/eval splits.",
)
def oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.oov_rate_by_source(docs)


@_spec(
    "weibull_lifetime_fit",
    survival.weibull_lifetime_fit_sql(),
    "survival op — Weibull probability-plot fit of user lifetimes on "
    "the Kaplan-Meier curve (shape from the ln(-ln S) vs ln t OLS, "
    "scale = exp(-intercept/shape)): survival rounded 9dp before the "
    "log-log transform, moment sums rounded 6dp; the parametric "
    "churn summary (k<1 infant-mortality, k>1 wear-out).",
)
def weibull_lifetime_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return survival.weibull_lifetime_fit(events)


@_spec(
    "extreme_value_return_levels",
    timeseries.extreme_value_return_levels_sql(),
    "ops op — Gumbel method-of-moments return levels (1-in-30/90/365 "
    "day volumes) per event type: exact bigint power sums, shared "
    "literal constants, fixed IEEE expressions, zero rounding; the "
    "capacity-planning number a plain max understates.",
)
def extreme_value_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.extreme_value_return_levels(events)
