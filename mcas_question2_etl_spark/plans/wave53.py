"""Wave-53 extension specs: empirical-Bayes rate shrinkage,
delta-method ratio A/B test, conversion latency quantiles, Theil
inequality decomposition, source vocabulary Jaccard.

Reference scope: EB shrinkage is the canonical next step for the
reference's small-school rate reports (SURVEY §2.12 analysis layer);
the rest are beyond-reference experimentation/corpus QA (§2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import concentration, evaluation, shrinkage, text, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "eb_shrunk_return_rates",
    shrinkage.eb_shrunk_rates_sql("lineitem", "l_partkey", "l_returnflag = 'R'"),
    "analytics op — beta-binomial empirical-Bayes shrinkage of "
    "per-part return rates (method of moments): exact global rate, "
    "rounded between-part variance (the one order-sensitive sum), "
    "guarded prior strength, one fixed shrink expression per part; "
    "the small-sample fix the reference's raw rate reports need.",
)
def eb_shrunk_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return shrinkage.eb_shrunk_rates(li, "l_partkey", F.col("l_returnflag") == "R")


_RATIO_TABLE_SQL = """
SELECT o.o_custkey AS unit, c.c_mktsegment AS seg, o.o_totalprice AS price
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
"""


@_spec(
    "ratio_metric_ab_test",
    evaluation.ratio_metric_ab_test_sql(
        _RATIO_TABLE_SQL, "unit", "seg", "BUILDING", "MACHINERY", "price"
    ),
    "experimentation op — delta-method z-test for the revenue-per-"
    "order ratio metric between two market segments with the CUSTOMER "
    "as randomization unit: DECIMAL-exact per-unit numerators and "
    "cross-unit moment sums, fixed IEEE variance expression, zero "
    "rounding.",
)
def ratio_metric_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("o_custkey").alias("unit"),
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("price"),
    )
    return evaluation.ratio_metric_ab_test(
        joined, "unit", "seg", "BUILDING", "MACHINERY", "price"
    )


@_spec(
    "conversion_latency_quantiles",
    timeseries.conversion_latency_quantiles_sql(),
    "funnel op — click->purchase latency percentiles per converting "
    "user: exact integer-micros first-pair latencies, type-1 lower "
    "element picks through the value-grain cumulative ladder; the "
    "how-fast companion to funnel_conversion's how-many.",
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.conversion_latency_quantiles(events)


@_spec(
    "theil_doclen_decomposition",
    concentration.theil_decomposition_sql("documents", "source", "n_chars"),
    "inequality op — Theil T of document length with the exact "
    "within/between source decomposition Gini lacks: exact bigint "
    "char totals, per-source x*ln(x) sums rounded 9dp, fixed IEEE "
    "share/term expressions, k-term totals rounded.",
)
def theil_doclen_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return concentration.theil_decomposition(docs, "source", "n_chars")


@_spec(
    "source_vocab_jaccard",
    text.source_vocab_jaccard_sql(),
    "corpus op — vocabulary-overlap Jaccard matrix between sources: "
    "distinct token sets per source, token-grain self-join "
    "intersections (tokens shuffle once, text never), exact bigint "
    "set algebra, one division per pair.",
)
def source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.source_vocab_jaccard(docs)
