"""Wave-41 extension specs: Kaplan-Meier retention, RFM segmentation,
one-way ANOVA, Spearman rank correlation, seasonal-naive backtest.

Reference scope: none exist in the reference repo (pandas/R ETL);
they extend the engine's survival-analysis, customer-analytics,
statistical-testing, and forecasting surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import evaluation, segmentation, survival, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "kaplan_meier_retention",
    survival.kaplan_meier_sql(),
    "survival op — Kaplan-Meier product-limit retention over user "
    "lifetimes with 7-day right-censoring: integer-day lifetimes and "
    "exact risk-set counts; the only float work is the exp-sum-log "
    "cumulative product over the tiny distinct-lifetime table.",
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return survival.kaplan_meier(events)


@_spec(
    "rfm_customer_segments",
    segmentation.rfm_segments_sql(),
    "segmentation op — RFM quintile scoring of customers from orders "
    "(recency/frequency/monetary, 5 = best) via the distributed "
    "two-phase NTILE (no single-task global window), unique tiebreak "
    "on the customer key, decimal-exact monetary sums; 125-group "
    "rollup output.",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return segmentation.rfm_segments(orders)


@_spec(
    "anova_f_priority_price",
    evaluation.anova_f_sql("orders", "o_orderpriority", "o_totalprice"),
    "stats op — one-way ANOVA F of order totals across the 5 order "
    "priorities: per-group moments as exact decimal sums (order-free "
    "in both engines), k-row reduction, SSB/SSW/F in double on "
    "bit-identical inputs, rounded like the other test statistics.",
)
def anova_f_priority_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return evaluation.anova_f(orders, "o_orderpriority", "o_totalprice")


@_spec(
    "spearman_qty_price",
    evaluation.spearman_corr_sql(
        "lineitem", "l_returnflag", "l_quantity", "l_extendedprice"
    ),
    "stats op — per-returnflag Spearman rank correlation of quantity "
    "vs price, tie-correct average-rank form: DOUBLED average ranks "
    "are integers, so every moment accumulates exactly in "
    "DECIMAL(38,0) and the final rho needs no rounding at all; two "
    "rank windows share one shuffle on the group key.",
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return evaluation.spearman_corr(li, "l_returnflag", "l_quantity", "l_extendedprice")


@_spec(
    "seasonal_naive_backtest",
    timeseries.seasonal_naive_backtest_sql(),
    "forecast op — seasonal-naive (lag-7) backtest over per-type "
    "daily event counts with exact integer error moments: WAPE, bias "
    "and RMSE from bigint sums (no order-dependent float averaging), "
    "scored via a days-sized self-join of the daily rollup.",
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.seasonal_naive_backtest(events)
