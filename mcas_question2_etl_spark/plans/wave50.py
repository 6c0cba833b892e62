"""Wave-50 extension specs: Pettitt changepoint, BH-FDR over per-type
tests, G-test of independence, Cohen's kappa between gates,
day-of-week seasonality indices.

Reference scope: all beyond-reference statistical QA (SURVEY §2.13)
extending the drift/changepoint family (cusum, psi, ks) and the
contingency family (chi-square) with their standard companions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import evaluation, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "pettitt_changepoint",
    timeseries.pettitt_changepoint_sql(),
    "stats op — Pettitt rank-based single changepoint per event type: "
    "exact-bigint U_t from the day-pair sign kernel + one prefix "
    "window, earliest-day argmax, exp() significance rounded 9dp; "
    "the distribution-free complement to cusum_changepoint.",
)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.pettitt_changepoint(events)


_PETTITT_PVALS_SQL = (
    "SELECT event_type, p_value FROM ("
    + timeseries.pettitt_changepoint_sql()
    + ")"
)


@_spec(
    "bh_fdr_changepoints",
    evaluation.bh_adjust_sql(_PETTITT_PVALS_SQL, "event_type", "p_value"),
    "stats op — Benjamini-Hochberg FDR adjustment across the per-type "
    "Pettitt p-values: step-up q = p*m/rank + reverse running min, "
    "key-tie-broken ranking so both engines sort identically; the "
    "multiple-testing control for every per-group test in the repo.",
)
def bh_fdr_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pv = timeseries.pettitt_changepoint(events).select("event_type", "p_value")
    return evaluation.bh_adjust(pv, "event_type", "p_value")


@_spec(
    "g_test_source_lang",
    evaluation.g_test_sql("documents", "source", "lang"),
    "stats op — G-test (log-likelihood ratio) of source x language "
    "independence: exact integer marginals, zero cells preserved via "
    "the marginal cross join, per-cell 2*O*ln(O/E) contributions, "
    "G rounded 9dp; the additive companion to chi_square_source_lang.",
)
def g_test_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return evaluation.g_test(docs, "source", "lang")


@_spec(
    "cohens_kappa_gates",
    evaluation.cohens_kappa_sql(
        "documents",
        "n_chars >= 300",
        "len(regexp_extract_all(text, '\\S+')) >= 55",
    ),
    "eval op — Cohen's kappa between two document gates (char-length "
    ">= 300 vs word-count >= 55): chance-corrected agreement from "
    "one conditional-aggregate pass over exact 2x2 cell counts; "
    "single IEEE po/pe/kappa expressions, zero rounding.",
)
def cohens_kappa_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return evaluation.cohens_kappa(
        docs,
        F.col("n_chars") >= 300,
        F.regexp_count(F.col("text"), F.lit(r"\S+")) >= 55,
    )


@_spec(
    "dow_seasonality_index",
    timeseries.dow_seasonality_index_sql(),
    "forecast op — multiplicative day-of-week seasonal indices per "
    "event type over observed days: ratio-of-exact-ratios, ISO "
    "weekday computed portably on both engines; the detector behind "
    "seasonal_naive_backtest's lag-7 choice.",
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.dow_seasonality_index(events)
