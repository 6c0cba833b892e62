"""Wave-49 extension specs: Kruskal-Wallis, Mann-Kendall trend test,
isotonic calibration, Coleman-Liau readability, Holt linear backtest.

Reference scope: nonparametric/statistical QA extending the
reference's parametric analysis surface (run_analysis.Rmd's GLM,
SURVEY §2.12/§2.13); readability extends the documents-table text
gates; forecasting extends the daily-rollup timeseries family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import evaluation, regression, text, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "kruskal_wallis_doclen",
    evaluation.kruskal_wallis_sql("documents", "source", "n_chars"),
    "stats op — Kruskal-Wallis H across sources on document length: "
    "value-grain pooled doubled-ranks (exact bigints), DECIMAL rank "
    "sums, tie-corrected H rounded at 9dp (k-term double sum); "
    "nonparametric sibling of anova_f.",
)
def kruskal_wallis_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return evaluation.kruskal_wallis(docs, "source", "n_chars")


@_spec(
    "mann_kendall_daily_trend",
    timeseries.mann_kendall_trend_sql(),
    "stats op — Mann-Kendall trend test per event type over daily "
    "counts: exact-integer S from the day-pair kernel, tie-corrected "
    "variance and tau-b from exact bigint moments, continuity-"
    "corrected z; the significance companion to theil_sen_daily_trend.",
)
def mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.mann_kendall_trend(events)


_ISO_BUCKETED_SQL = """
SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS bucket,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            AS BIGINT) AS num,
       CAST(COUNT(*) AS BIGINT) AS den
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY 1
"""


@_spec(
    "isotonic_acctbal_urgency",
    regression.isotonic_fit_sql(_ISO_BUCKETED_SQL),
    "calibration op — weighted L2 isotonic regression (closed minimax "
    "form, no sequential PAV) of urgent-order rate over account-"
    "balance buckets: exact prefix-sum interval averages (one "
    "division each), O(k^3) triple join over the tiny bucket table; "
    "corpus scanned once to bucket.",
)
def isotonic_acctbal_urgency(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    bucketed = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_acctbal")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bucket")
        )
        .agg(
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("bigint"))
            .cast("bigint")
            .alias("num"),
            F.count(F.lit(1)).cast("bigint").alias("den"),
        )
    )
    return regression.isotonic_fit(bucketed, "bucket", "num", "den")


@_spec(
    "coleman_liau_readability",
    text.coleman_liau_report_sql(),
    "text op — Coleman-Liau readability grade per source: exact "
    "letter/word/sentence regex counts aggregated per source, one "
    "fixed IEEE index expression; scan-stage only, text never "
    "shuffles.",
)
def coleman_liau_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.coleman_liau_report(docs)


@_spec(
    "holt_linear_backtest",
    timeseries.holt_linear_backtest_sql(),
    "forecast op — Holt level+trend one-step-ahead backtest per event "
    "type: fixed-order IEEE fold over the day-sorted series (JVM "
    "aggregate(), no UDF) vs the identical recursion as a recursive "
    "CTE; bit-identical level/trend/MAE, zero rounding.",
)
def holt_linear_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return timeseries.holt_linear_backtest(events)
