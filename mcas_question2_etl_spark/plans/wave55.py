"""Wave-55 extension specs: RAKE keywords, sliding vocabulary drift,
token burstiness, SRM check, deterministic negative sampling.

Reference scope: all beyond-reference (SURVEY §2.13) — NLP keyword
extraction and burstiness extend the text layer, drift extends the
monitoring family, SRM and negative sampling extend the
experimentation/training-data families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import evaluation, sampling, text
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "rake_keywords",
    text.rake_keywords_sql(),
    "NLP op — RAKE keyword extraction: stopword/punctuation boundary "
    "phrases (regex verified to split identically under Java regex "
    "and RE2), exact deg/freq bigints, per-phrase ratio sums rounded "
    "9dp; multi-word domain terms outrank unigrams.",
)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.rake_keywords(docs)


@_spec(
    "sliding_vocab_drift",
    text.sliding_vocab_drift_sql(),
    "monitoring op — Jaccard of consecutive id-bucket vocabularies "
    "(5 equal-width ingest-order buckets): exact bigint set algebra, "
    "adjacent pairs only; the between-checkpoint complement to "
    "vocab_growth_curve.",
)
def sliding_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.sliding_vocab_drift(docs)


@_spec(
    "token_burstiness_report",
    text.token_burstiness_report_sql(),
    "text op — Church-Gale burstiness (collection frequency / "
    "document frequency) per token with df >= 10: one tokenized "
    "pass, exact bigints, one division; the term-concentration "
    "signal beyond tf-idf.",
)
def token_burstiness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.token_burstiness_report(docs)


@_spec(
    "srm_check_users",
    evaluation.srm_check_sql("events", "user_id"),
    "experimentation op — sample-ratio-mismatch check of a 2-arm "
    "md5-hash split over distinct users: exact arm counts, "
    "chi-square GOF against equal allocation, 1%% critical flag; "
    "the gate every A/B readout must pass first.",
)
def srm_check_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return evaluation.srm_check(events, "user_id")


@_spec(
    "negative_sampling_pairs",
    sampling.negative_sampling_pairs_sql("documents", "doc_id"),
    "training-data op — deterministic contrastive negatives: k=3 "
    "modular-arithmetic draws over the dense doc_id range, "
    "RNG-free and partitioning-independent (never the anchor); "
    "scan-stage integer expressions only.",
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.negative_sampling_pairs(docs, "doc_id")
