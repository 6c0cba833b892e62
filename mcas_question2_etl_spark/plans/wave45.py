"""Wave-45 extension specs: k-anonymity audit, activity streaks,
KWIC snippets, functional-dependency and key-candidate profiling.

Reference scope: none exist in the reference repo (pandas/R ETL);
they extend the engine's privacy, habit-metric, concordance, and
schema-profiling surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import privacy, profiling, text, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_QI = ("c_nationkey", "c_mktsegment")


@_spec(
    "k_anonymity_customers",
    privacy.k_anonymity_audit_sql("customer", _QI, "c_acctbal"),
    "privacy op — k-anonymity / l-diversity release audit over the "
    "customer quasi-identifiers (nation, segment) with account "
    "balance as the sensitive column: equivalence-class size "
    "histogram with per-size minimum l, all exact COUNT/COUNT "
    "DISTINCT, one QI groupBy + class-table rollups.",
)
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return privacy.k_anonymity_audit(cust, _QI, "c_acctbal")


@_spec(
    "activity_streak_histogram",
    timeseries.activity_streak_histogram_sql(),
    "habit-metric op — longest consecutive-active-day streak per user "
    "via the gaps-and-islands identity (day - row_number constant "
    "within a run): no self-join, no iteration, all-integer; one "
    "shuffle on the user key, histogram rollup.",
)
def activity_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.activity_streak_histogram(events)


@_spec(
    "kwic_spark_snippets",
    text.kwic_snippets_sql("spark"),
    "concordance op — keyword-in-context snippets for 'spark': "
    "tokenize once, positional explode, term filter, +-2-token array "
    "slice; zero shuffle (pure scan-stage expressions), byte-exact "
    "string output.",
)
def kwic_spark_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.kwic_snippets(docs, "spark")


_FD_PAIRS = (("p_brand", "p_type"), ("p_type", "p_brand"), ("p_partkey", "p_name"))


@_spec(
    "functional_dependency_parts",
    profiling.functional_dependency_audit_sql("part", _FD_PAIRS),
    "profiling op — candidate functional dependencies over part "
    "(brand->type, type->brand, key->name): per-lhs distinct-rhs "
    "class tables, violation counts, exact bigints throughout.",
)
def functional_dependency_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return profiling.functional_dependency_audit(part, _FD_PAIRS)


_KEY_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@_spec(
    "key_candidate_orders",
    profiling.key_candidate_profile_sql("orders", _KEY_COLS),
    "profiling op — per-column uniqueness/key-candidate profile of "
    "orders in ONE aggregate pass (multi-distinct expanded by the "
    "engine, still a single scan) + static unpivot; exact distinct/"
    "null counts, single-division uniqueness ratio.",
)
def key_candidate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return profiling.key_candidate_profile(orders, _KEY_COLS)
