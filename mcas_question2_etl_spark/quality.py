"""Data-quality / constraint layer (SURVEY.md §2.9 T1-T3).

The reference enforces correctness with eager cardinality checks:
``pd.merge(..., validate='1:1')`` (school_outcomes_etl.py:127),
dplyr ``relationship='many-to-one'/'one-to-one'``
(create_school_town_lookup.Rmd:54, run_analysis.Rmd:50-60), and a
unique-key assertion (dashboard/app_data.R:40). Spark has no built-in
join-cardinality validation, so this module provides it as an eager
pre-join check.

Scale note: each check is one distributed aggregation
(groupBy(key).count().filter('cnt > 1').limit(1)) — a map-side-combinable
hash aggregate followed by an early-exit limit, so the cost is one pass
over the validated side, not a join. On a 100 TB input you'd gate these
behind a flag (as `validate=` is opt-in in pandas), which is exactly the
API shape here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class JoinValidationError(ValueError):
    """Raised when a join-cardinality contract is violated.

    Mirrors pandas.errors.MergeError (school_outcomes_etl.py:127) and
    dplyr's join relationship errors.
    """


def _duplicate_key_example(df: DataFrame, keys: list[str]):
    """Return one duplicated key tuple, or None if keys are unique."""
    dup = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > 1)
        .limit(1)
        .collect()
    )
    return tuple(dup[0][k] for k in keys) if dup else None


def assert_unique_key(df: DataFrame, keys: str | list[str], side: str = "input") -> None:
    """PK-uniqueness assertion (T3, dashboard/app_data.R:40)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    example = _duplicate_key_example(df, keys)
    if example is not None:
        raise JoinValidationError(
            f"{side} has duplicate key {dict(zip(keys, example))} for unique key {keys}"
        )


def validate_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    validate: str = "m:m",
) -> DataFrame:
    """Equi-join with pandas-style cardinality validation (T1/T2).

    ``validate`` is one of '1:1', '1:m', 'm:1', 'm:m' — the pandas
    ``merge(validate=...)`` vocabulary; dplyr's relationship= maps onto
    the same four ('one-to-one' == '1:1' etc.).
    """
    keys = [on] if isinstance(on, str) else list(on)
    spec = validate.replace("one", "1").replace("many", "m").replace("-to-", ":")
    if spec not in {"1:1", "1:m", "m:1", "m:m"}:
        raise ValueError(f"invalid validate spec {validate!r}")
    left_card, right_card = spec.split(":")
    if left_card == "1":
        assert_unique_key(left, keys, side="left side of join")
    if right_card == "1":
        assert_unique_key(right, keys, side="right side of join")
    return left.join(right, on=keys, how=how)
