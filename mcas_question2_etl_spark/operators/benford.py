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


# ──────────────────────────────────────────────────────────────────────────
# wave 116: second-digit Benford test
# ──────────────────────────────────────────────────────────────────────────


def benford_second_digit(df: DataFrame, col: str) -> DataFrame:
    """Second-digit Benford audit: P(d₂ = d) = Σ_{k=1..9}
    log10(1 + 1/(10k + d)) for d = 0..9 — the forensic standard for
    detecting ROUNDING and threshold manipulation that the
    first-digit test (benford_audit above) is blind to: padding
    amounts to 4,9xx or x,000 leaves first digits intact and warps
    the second. Values need integer part ≥ 10 (two digits). Same
    exact-count + literal-expectation shape as the first-digit
    audit; per-digit chi² terms. Output: (digit, n_obs, p_obs,
    p_benford2, chi_term), digit-ordered."""
    p2 = None
    for k in range(1, 10):
        term = F.log10(
            F.lit(1.0)
            + F.lit(1.0) / (F.lit(10.0) * k + F.col("digit").cast("double"))
        )
        p2 = term if p2 is None else p2 + term
    digits = df.filter(F.col(col) >= 10).select(
        F.substring(
            F.floor(F.col(col)).cast("bigint").cast("string"), 2, 1
        )
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
            p2.alias("p_benford2"),
            (
                F.pow(F.col("n_obs") - F.col("__tot") * p2, 2)
                / (F.col("__tot") * p2)
            ).alias("chi_term"),
        )
        .orderBy("digit")
    )


def benford_second_digit_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`benford_second_digit`."""
    p2 = " + ".join(
        f"log10(1.0 + 1.0 / (10.0 * {k} + CAST(digit AS DOUBLE)))"
        for k in range(1, 10)
    )
    return f"""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor({col}) AS BIGINT) AS VARCHAR),
                            2, 1) AS INTEGER) AS digit
      FROM {table} WHERE {col} >= 10
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS tot FROM c)
    SELECT digit, n_obs,
           n_obs / tot AS p_obs,
           ({p2}) AS p_benford2,
           pow(n_obs - tot * ({p2}), 2) / (tot * ({p2})) AS chi_term
    FROM c, t ORDER BY digit
    """
