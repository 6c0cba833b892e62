"""Wave-51 extension specs: Jaro-Winkler linkage, integer moments
profile, PMI collocations, vocabulary growth curve, decayed
popularity.

Reference scope: record linkage extends the fuzzy-match family the
reference's school-name joins imply (school_outcomes_etl.py keyed
merges); the rest are beyond-reference corpus/ops analytics
(SURVEY §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import editjoin, profiling, text, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_JW_BLOCK_SQL = (
    "string_split(p_name, ' ')[1] || ' ' || string_split(p_name, ' ')[2]"
)


@_spec(
    "jaro_winkler_blocklink",
    editjoin.jaro_winkler_pairs_sql(
        "part", "p_partkey", "p_name",
        threshold=0.95, block_sql=_JW_BLOCK_SQL, block_sample_mod=8,
    ),
    "linkage op — Jaro-Winkler similarity self-join over two-token "
    "blocks of part names (md5-sampled 1-in-8 blocks, the bounded-"
    "kernel discipline — the synthetic color-vocab names make single-"
    "token blocks quadratic-dense): Arrow-batched textbook JW kernel "
    "on candidate pairs only (verified bit-equal to DuckDB's "
    "builtin), scores rounded 9dp before the 0.95 threshold.",
)
def jaro_winkler_blocklink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    part = load_table(spark, sf_dir, "part")
    blocked = part.withColumn(
        "__blk2",
        F.concat_ws(
            " ",
            F.split(F.col("p_name"), " ").getItem(0),
            F.split(F.col("p_name"), " ").getItem(1),
        ),
    )
    return editjoin.jaro_winkler_pairs(
        blocked, "p_partkey", "p_name",
        block_col="__blk2", threshold=0.95, block_sample_mod=8,
    )


@_spec(
    "doclen_moments_profile",
    profiling.integer_moments_profile_sql("documents", "source", "n_chars"),
    "profiling op — skewness/excess-kurtosis of document length per "
    "source from DECIMAL(38,0)-exact power sums S1..S4; fixed IEEE "
    "central-moment expressions parenthesized identically in both "
    "engines, zero rounding.",
)
def doclen_moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return profiling.integer_moments_profile(docs, "source", "n_chars")


@_spec(
    "pmi_collocations",
    text.pmi_cooccurrence_pairs_sql(),
    "text op — PMI collocations over top-40 vocabulary token pairs "
    "co-occurring in documents: doc-frequency-capped pair space "
    "(O(docs*k^2), never corpus-wide), exact bigint counts, one "
    "rounded ln per pair.",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.pmi_cooccurrence_pairs(docs)


@_spec(
    "vocab_growth_curve",
    text.vocab_growth_curve_sql(),
    "corpus op — Heaps-law vocabulary growth at 10 id-range "
    "checkpoints: first-appearance MIN(id) per token, integer-exact "
    "bucket math and cumulative sums; the corpus-novelty monitor "
    "complementing the LSH dedup family.",
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.vocab_growth_curve(docs)


@_spec(
    "decayed_event_popularity",
    timeseries.decayed_popularity_sql(),
    "ops op — exponentially time-decayed popularity per event type "
    "(half-life 7d, ages as exact integer daydiffs from the global "
    "max day): per-day pow weights on exact inputs, day-grain sum "
    "rounded 6dp.",
)
def decayed_event_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.decayed_popularity(events)
