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
