"""Wave-40 extension specs: Benford ingest audit, time-weighted
averages, Neyman stratified sampling, weighted quantiles, and the
Markov steady-state event mix.

Reference scope: none exist in the reference repo (pandas/R ETL);
they extend the engine's data-quality, time-series, sampling, and
behavioral-analytics surfaces (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import aggregates, benford, markov, sampling, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "benford_price_digits",
    benford.benford_audit_sql("orders", "o_totalprice"),
    "data-quality op — Benford first-digit conformance of order "
    "totals (corruption/unit-mixing tripwire): string-on-integer "
    "digit extraction (explicit floor — Spark's double->bigint cast "
    "truncates, DuckDB's rounds), one 9-row groupBy with map-side "
    "combine, per-digit chi-square terms.",
)
def benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return benford.benford_audit(orders, "o_totalprice")


@_spec(
    "twap_user_daily_value",
    timeseries.time_weighted_avg_sql(),
    "time-series op — per-user-day time-weighted average value "
    "(TWAP): each observation weighted by its exact integer-micros "
    "holding interval to the next event, deterministic (ts, event_id) "
    "tiebreak so simultaneous events weight identically in both "
    "engines; one window shuffle, the aggregation rides the same "
    "partitioning.",
)
def twap_user_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.time_weighted_avg(events)


@_spec(
    "neyman_stratified_docs",
    sampling.neyman_allocation_sql(
        "documents", "source", "n_chars", "doc_id", budget=120
    ),
    "sampling op — Neyman-optimal stratified allocation over document "
    "sources (budget where the variance is) with a hash-deterministic "
    "take: exact integer moments for sigma, DECIMAL cross-stratum "
    "total so no double-sum ulp can flip the floor() at an integer "
    "boundary, md5-ordered row_number take per stratum.",
)
def neyman_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.neyman_allocation(docs, "source", "n_chars", "doc_id", budget=120)


@_spec(
    "weighted_price_quantiles",
    aggregates.weighted_quantiles_sql(
        "lineitem", "l_returnflag", "l_extendedprice", "l_quantity"
    ),
    "aggregate op — quantity-weighted price quartiles per returnflag "
    "(lower weighted-CDF inverse): one window shuffle on the group "
    "key, conditional-MIN picks share the aggregation; integer-valued "
    "weights keep every prefix sum and threshold exact, so the "
    "comparisons are engine-deterministic.",
)
def weighted_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return aggregates.weighted_quantiles(li, "l_returnflag", "l_extendedprice", "l_quantity")


@_spec(
    "markov_stationary_mix",
    markov.stationary_mix_sql(rounds=3),
    "behavioral op — Markov steady-state event mix: 3 unrolled power "
    "iterations of pi <- pi.P over the per-user transition counts, "
    "compared against the empirical mix (momentum detector). The only "
    "corpus-sized work is the lead-window transition count; the "
    "iteration runs on the k x k broadcastable matrix.",
)
def markov_stationary_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return markov.stationary_mix(markov.transition_counts(events), rounds=3)
