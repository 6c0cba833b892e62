"""Benford first-digit conformance audit.

Naturally-arising multiplicative quantities (transaction amounts,
populations, file sizes) follow Benford's law
P(d) = log10(1 + 1/d); systematic deviation is the classic
data-corruption / fabrication / unit-mixing tripwire, which makes
this a standard ingest-quality gate next to schema expectations.

Digit extraction is STRING-based on the integer part:
``substring(cast(cast(floor(x) as bigint) as string), 1, 1)``. The
explicit ``floor`` matters because Spark's double->bigint cast
truncates while DuckDB's rounds to nearest (999.7 would read as
digit 9 vs digit 1). String-on-integer also avoids the
``floor(x / 10^floor(log10 x))`` form, whose float log10 sits on a
representability boundary at powers of ten (log10(1000.0) can
evaluate to 2.999...96 and misclassify); the decimal string of a
BIGINT is engine-independent. Values < 1 are excluded (their first
significant digit is not in the integer part).

Scale shape: one scan + one 9-row groupBy with map-side combine; the
expected-share join is a 9-row broadcast. Per-digit chi-square terms
come out alongside observed/expected shares so the caller can sum a
test statistic or inspect digits individually.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_audit(df: DataFrame, col: str) -> DataFrame:
    """(digit, n_obs, p_obs, p_benford, chi_term) over positive values
    of ``col`` with integer part >= 1; digit is int 1..9."""
    digits = df.filter(F.col(col) >= 1).select(
        F.substring(F.floor(F.col(col)).cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    total = counts.agg(F.sum("n_obs").cast("double").alias("__tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            (F.col("n_obs") / F.col("__tot")).alias("p_obs"),
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")).alias("p_benford"),
            (
                F.pow(
                    F.col("n_obs")
                    - F.col("__tot") * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")),
                    2,
                )
                / (F.col("__tot") * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")))
            ).alias("chi_term"),
        )
    )


def benford_audit_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`benford_audit`."""
    return f"""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor({col}) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM {table} WHERE {col} >= 1
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS tot FROM c)
    SELECT digit, n_obs,
           n_obs / tot AS p_obs,
           log10(1.0 + 1.0 / digit) AS p_benford,
           pow(n_obs - tot * log10(1.0 + 1.0 / digit), 2)
             / (tot * log10(1.0 + 1.0 / digit)) AS chi_term
    FROM c, t
    """
