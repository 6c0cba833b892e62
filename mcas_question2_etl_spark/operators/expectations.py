"""Data-quality expectations: a deequ-style declarative check suite
computed in ONE distributed pass.

The reference enforces quality with scattered imperative asserts
(SURVEY §2.9 T1-T3); a 100 TB ingest needs the checks batched instead:
every expectation contributes one aggregate expression, the whole
suite runs as a single `df.agg(...)` (one scan, one reduce — plus one
shuffle if a uniqueness check needs countDistinct), and the result is
a small report relation (check, observed, passed) a pipeline can gate
on or append to a quality-history table.

Unlike quality.py's `validate_join` (which raises mid-pipeline to
reproduce pandas/dplyr semantics), these report — the
monitoring-vs-guardrail split every production pipeline ends up with.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    observed: Column  # aggregate expression -> double
    passed: Column  # boolean over the observed value


def expect_min_rows(n: int) -> Expectation:
    obs = F.count(F.lit(1)).cast("double")
    return Expectation(f"min_rows_{n}", obs, obs >= n)


def expect_not_null(col: str) -> Expectation:
    obs = F.avg(F.col(col).isNull().cast("double"))
    return Expectation(f"not_null_{col}", obs, obs == 0.0)


def expect_unique(col: str) -> Expectation:
    obs = (F.countDistinct(col) - F.count(col)).cast("double")
    return Expectation(f"unique_{col}", obs, obs == 0.0)


def expect_values_in(col: str, values: tuple[str, ...]) -> Expectation:
    obs = F.avg((~F.col(col).isin(*values)).cast("double"))
    return Expectation(f"values_in_{col}", obs, obs == 0.0)


def expect_range(col: str, lo: float, hi: float) -> Expectation:
    # observed = fraction of rows outside [lo, hi]
    out = (F.col(col) < lo) | (F.col(col) > hi)
    obs = F.avg(out.cast("double"))
    return Expectation(f"range_{col}", obs, obs == 0.0)


def quality_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Run the suite in one aggregate; returns (check, observed, passed)."""
    wide = df.agg(
        *[
            c
            for e in expectations
            for c in (
                e.observed.alias(f"__o_{e.name}"),
                e.passed.alias(f"__p_{e.name}"),
            )
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("check"),
                F.col(f"__o_{e.name}").alias("observed"),
                F.col(f"__p_{e.name}").alias("passed"),
            )
            for e in expectations
        ]
    )
    return wide.select(F.explode(pairs).alias("r")).select(
        "r.check", "r.observed", "r.passed"
    )


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column-profile report — the first thing a data engineer runs on
    an unknown table: per column ``n_nulls``, ``n_distinct``, and the
    string-rendered ``min_value`` / ``max_value``.

    Same one-pass shape as :func:`quality_report`: ALL per-column
    aggregates ride a single Aggregate (one scan, partial aggregation
    map-side), then pivot to one row per column with an explode of a
    literal struct array — no per-column scans, no driver loop. At
    100 TB profiling costs exactly one pass over the table.
    """
    if cols is None:
        cols = list(df.columns)
    wide = df.agg(
        *[
            a
            for c in cols
            for a in (
                F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"),
                F.count_distinct(F.col(c)).alias(f"__d_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
            )
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_nulls"),
                F.col(f"__d_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.column", "r.n_nulls", "r.n_distinct", "r.min_value", "r.max_value"
    )


def profile_columns_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`profile_columns` (UNION ALL per column —
    the oracle need not be one-pass, only value-identical)."""
    selects = [
        f"""
    SELECT '{c}' AS "column",
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(selects)
