"""Wave-43 extension specs: ABC revenue classes, contingency
residuals + Cramer's V, behavioral diversity histogram, log2 length
histogram, cross-source near-dup matrix.

Reference scope: none exist in the reference repo (pandas/R ETL);
they extend the engine's concentration-audit, categorical-stats,
profiling, and corpus-forensics surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import aggregates, concentration, dedup, entropy, evaluation
from ..registry import QuerySpec
from .data_pipeline import _LSH_PAIRS_SQL

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "abc_revenue_classes",
    concentration.abc_classes_sql("lineitem", "l_partkey", "l_extendedprice"),
    "concentration op — ABC/Pareto classification of parts by revenue "
    "(A = first 80% of cumulative value, B to 95%, C tail): all-"
    "decimal running prefix and thresholds so no boundary key can "
    "flip engines, distributed two-phase running sum (range shuffle + "
    "per-partition windows, no single-task global window), 3-row "
    "rollup.",
)
def abc_revenue_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return concentration.abc_classes(li, "l_partkey", "l_extendedprice")


@_spec(
    "contingency_priority_status",
    evaluation.contingency_residuals_sql(
        "orders", "o_orderpriority", "o_orderstatus"
    ),
    "stats op — contingency audit of order priority x status: "
    "per-cell expected counts and standardized residuals from exact "
    "integer marginals (single IEEE expressions, no rounding), "
    "table-level chi-square and Cramer's V rounded like the other "
    "test statistics; marginals derive from the cell table, never a "
    "second corpus scan.",
)
def contingency_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return evaluation.contingency_residuals(
        orders, "o_orderpriority", "o_orderstatus"
    )


@_spec(
    "user_diversity_histogram",
    entropy.diversity_histogram_sql(),
    "profiling op — histogram of per-user inverse-Simpson effective "
    "event-type counts: the per-key diversity is a single division of "
    "exact bigints (floor lands exactly on k for uniform k-type "
    "users), three shrinking map-side-combined aggregations, no ln, "
    "no rounding.",
)
def user_diversity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return entropy.diversity_histogram(events)


@_spec(
    "doc_length_log2_histogram",
    aggregates.log2_histogram_sql("documents", "source", "n_chars"),
    "profiling op — per-source power-of-two length histogram via "
    "EXACT bit-length bucketing (length(bin(x)) - 1, immune to the "
    "float-log2 cliff at exact powers of two); one scan expression + "
    "one (source, bucket) aggregation.",
)
def doc_length_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return aggregates.log2_histogram(docs, "source", "n_chars")


_NEARDUP_MATRIX_SQL = f"""
    WITH hits AS (
      SELECT a_id, b_id FROM (
        {_LSH_PAIRS_SQL}
      ) p WHERE jaccard >= 0.5
    ),
    lab AS (
      SELECT h.a_id, h.b_id,
             least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b
      FROM hits h
      JOIN documents da ON da.doc_id = h.a_id
      JOIN documents db ON db.doc_id = h.b_id
    )
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY source_a, source_b
    """


@_spec(
    "neardup_source_matrix",
    _NEARDUP_MATRIX_SQL,
    "corpus-forensics op — cross-source near-duplicate contamination "
    "matrix: portable-family MinHash LSH candidates, exact-Jaccard "
    "verified at >= 0.5 (a single exact-int division, so the "
    "threshold cannot flip engines), pair endpoints labeled by source "
    "with least/greatest normalization, source x source pair counts. "
    "The who-copies-whom audit that tells you which corpus slices "
    "leak into each other before mixing weights are set.",
)
def neardup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    cands = dedup.minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text", n=3, max_bucket=100
    )
    shingled = docs.select(
        "doc_id", dedup.char_ngrams("text", 3).alias("shingles")
    )
    a = shingled.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    b = shingled.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    hits = (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .withColumn(
            "jaccard",
            inter.cast("double") / (F.size("a_sh") + F.size("b_sh") - inter),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("a_id", "b_id")
    )
    src = docs.select("doc_id", "source")
    return (
        hits.join(src.select(F.col("doc_id").alias("a_id"), F.col("source").alias("__sa")), "a_id")
        .join(src.select(F.col("doc_id").alias("b_id"), F.col("source").alias("__sb")), "b_id")
        .groupBy(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
