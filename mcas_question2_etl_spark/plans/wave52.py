"""Wave-52 extension specs: QQ quantile comparison, volume drawdown,
transition entropy, MAD outlier audit, weekday-conditioned anomalies.

Reference scope: beyond-reference drift/robustness/sequence QA
(SURVEY §2.13) — the QQ table complements PSI/KS, MAD and the
weekday-conditioned baseline complement anomaly_days_zscore, the
transition entropy scores the markov.py chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators import entropy, profiling, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "qq_doclen_sources",
    profiling.qq_compare_sql("documents", "source", "n_chars"),
    "drift op — per-source QQ table of document length vs the pooled "
    "ladder at 19 percentile points: type-1 lower element picks "
    "(never interpolated), pooled ladder from the value-grain "
    "cumulative rollup (no global row ranking); exact integers "
    "throughout.",
)
def qq_doclen_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return profiling.qq_compare(docs, "source", "n_chars")


@_spec(
    "volume_drawdown",
    timeseries.volume_drawdown_sql(),
    "ops op — peak-to-trough max drawdown of daily volume per event "
    "type: running-peak window over the daily rollup, exact bigint "
    "drawdowns, earliest-day argmax.",
)
def volume_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.volume_drawdown(events)


@_spec(
    "transition_entropy_events",
    entropy.transition_entropy_sql(),
    "sequence op — conditional entropy H(next|current) of the event-"
    "type chain over per-user streams: one lead() per user (ts + "
    "event_id tie order), exact bigint pair counts, per-term ln on "
    "exact ratios, k^2-term sum rounded 9dp; perplexity = exp(H).",
)
def transition_entropy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return entropy.transition_entropy(events)


@_spec(
    "mad_outlier_days",
    timeseries.mad_outlier_days_sql(),
    "robust-stats op — modified z-score (median/MAD, Iglewicz-"
    "Hoaglin) outlier audit of daily volume per event type: exact "
    "lower-median element picks for both the median and the MAD, "
    "one fixed IEEE comparison per day; the 50%-breakdown-robust "
    "upgrade of anomaly_days_zscore.",
)
def mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.mad_outlier_days(events)


@_spec(
    "dow_anomaly_days",
    timeseries.dow_anomaly_days_sql(),
    "ops op — weekday-conditioned anomaly flags per event type: "
    "per-(type, ISO weekday) mean/sd from exact bigint power sums, "
    "|x - mu| > 2 sigma verdicts as fixed IEEE expressions; the "
    "seasonality-adjusted baseline wave-36's autocorrelation report "
    "motivates.",
)
def dow_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.dow_anomaly_days(events)
