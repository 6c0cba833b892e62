"""Wave-44 extension specs: last-touch attribution, order/line
reconciliation, duplicate-transaction audit, feature-hash collision
report.

Reference scope: none exist in the reference repo (pandas/R ETL);
they extend the engine's attribution, financial-audit, and
feature-engineering surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import attribution, reconcile, text
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "last_touch_attribution",
    attribution.last_touch_attribution_sql(),
    "attribution op — last-touch conversion credit within a 7-day "
    "lookback as ONE user-keyed window pass (last-ignorenulls over "
    "unboundedPreceding..-1), not a conversions-to-touches range "
    "join: deterministic (ts, event_id) order, exact integer-micros "
    "lookback compare, channels-row rollup.",
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return attribution.last_touch_attribution(events)


@_spec(
    "order_total_reconciliation",
    reconcile.order_total_reconciliation_sql(),
    "finance-audit op — header-vs-recomputed-lines reconciliation: "
    "per-line price*(1-disc)*(1+tax) DECIMAL-exact at scale 6, "
    "order-free per-order sums, decimal magnitude buckets (exact / "
    "<1 / >=1 / no_lines) so no boundary order flips engines; one "
    "order-key join, 4-row rollup.",
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return reconcile.order_total_reconciliation(orders, li)


@_spec(
    "duplicate_order_audit",
    reconcile.duplicate_transaction_audit_sql(),
    "finance-audit op — double-charge tripwire: (customer, exact-"
    "decimal amount, day) group multiplicity histogram; one groupBy "
    "plus a group-table rollup, all exact bigints.",
)
def duplicate_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return reconcile.duplicate_transaction_audit(orders)


@_spec(
    "feature_hash_collision_report",
    text.feature_hash_report_sql(),
    "feature-engineering op — hashing-trick pre-flight: md5-portable "
    "token->bucket assignment (1024 buckets), bucket-occupancy "
    "histogram with vocab and mass columns, all exact bigints; "
    "explode + three shrinking aggregations.",
)
def feature_hash_collision_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.feature_hash_report(docs)
