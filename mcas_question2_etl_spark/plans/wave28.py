"""Wave-28 extension spec: two-sample Kolmogorov-Smirnov test —
distribution equality between two corpus sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_SRC_A = "src0"
_SRC_B = "src1"


@_spec(
    "ks_test_sources",
    f"""
    WITH vals AS (
      SELECT source, n_chars AS v FROM documents
      WHERE source IN ('{_SRC_A}', '{_SRC_B}')
    ),
    per_v AS (
      SELECT v,
             SUM(CASE WHEN source = '{_SRC_A}' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN source = '{_SRC_B}' THEN 1 ELSE 0 END) AS cb
      FROM vals GROUP BY v
    ),
    tot AS (
      SELECT SUM(ca) AS na, SUM(cb) AS nb FROM per_v
    ),
    cdf AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cca,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ccb
      FROM per_v
    ),
    diffs AS (
      SELECT c.v,
             ABS(CAST(c.cca AS DOUBLE) / t.na
                 - CAST(c.ccb AS DOUBLE) / t.nb) AS d
      FROM cdf c CROSS JOIN tot t
    )
    SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
           (SELECT MAX(d) FROM diffs) AS ks_stat,
           (SELECT MIN(v) FROM diffs
             WHERE d = (SELECT MAX(d) FROM diffs)) AS ks_at_value
    FROM tot t
    """,
    "extension — two-sample Kolmogorov-Smirnov test: the "
    "distribution-equality check between two corpus sources (max "
    "absolute CDF gap over the pooled support), completing the "
    "statistical family (Welch t = means, chi-square = categorical "
    "association, PSI = binned drift; KS is the binning-free "
    "continuous test). CDFs are cumulative windows over the "
    "AGGREGATED per-value counts — the window runs over distinct "
    "values, never rows — and every count is exact, so the statistic "
    "is one division away from integers",
)
def ks_test_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.filter(F.col("source").isin(_SRC_A, _SRC_B)).select(
        "source", F.col("n_chars").alias("v")
    )
    # materialize the tiny per-value count table and the diff table:
    # cdf/tot/argmax all reuse them, and without the checkpoint each
    # consumer re-scans the corpus through the lineage
    per_v = (
        vals.groupBy("v")
        .agg(
            F.sum((F.col("source") == _SRC_A).cast("long")).alias("ca"),
            F.sum((F.col("source") == _SRC_B).cast("long")).alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = per_v.select(
        "v",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
    )
    tot = per_v.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    diffs = cdf.crossJoin(F.broadcast(tot)).select(
        "v",
        "na",
        "nb",
        F.abs(
            F.col("cca").cast("double") / F.col("na")
            - F.col("ccb").cast("double") / F.col("nb")
        ).alias("d"),
    ).localCheckpoint(eager=False)
    mx = diffs.agg(F.max("d").alias("ks"))
    at = (
        diffs.join(F.broadcast(mx), diffs["d"] == mx["ks"])
        .agg(F.min("v").alias("ks_at_value"))
    )
    return (
        tot.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(at))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.col("ks").alias("ks_stat"),
            "ks_at_value",
        )
    )
