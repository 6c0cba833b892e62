"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE (session.py turns on ``adaptive.skewJoin``) splits skewed *shuffle
partitions* at runtime, but it cannot split a single hot *grouping key*
whose partial aggregate still lands on one reducer, and it only handles
sort-merge-join skew. These operators are the explicit fallback:

  * ``salted_agg`` — add a salt in [0, buckets), aggregate on
    (key, salt) so the hot key's rows spread over ``buckets`` reducers,
    then combine the partials on key alone. Works for any decomposable
    aggregate (sum/count/min/max, and avg as sum+count). The second
    shuffle moves only ``buckets`` rows per key — negligible.
  * ``salted_join`` — replicate the small side once per salt value and
    salt the big side deterministically, so one hot join key fans out
    over ``buckets`` tasks instead of one straggler.

Salting is semantically invisible — the result equals the unsalted
plan — which is exactly what makes these oracle-checkable: the DuckDB
twin is the *plain* GROUP BY / JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: combine functions for phase 2, per decomposable partial.
_COMBINE = {
    "sum": F.sum,
    "count": lambda c: F.sum(c),  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    buckets: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name -> (kind, input column) with kind
    in {'sum', 'count', 'min', 'max'}. 'count' matches SQL COUNT:
    COUNT(col) skips nulls; use column '*' (or None) for COUNT(*).
    ``salt_source`` derives the salt (default: a deterministic hash of
    the whole row, so the same input always salts identically and
    results are reproducible).
    """
    if salt_source is None:
        salt_source = F.xxhash64(F.struct(*[F.col(c) for c in df.columns]))
    salted = df.withColumn("__salt", F.pmod(salt_source, F.lit(buckets)))

    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (
                # 'count' follows SQL COUNT semantics: COUNT(col) skips
                # nulls; pass '*' (or None) for a row count.
                F.count(F.lit(1))
                if kind == "count" and col in (None, "*")
                else F.count(col)
                if kind == "count"
                else getattr(F, kind)(col)
            ).alias(name)
            for name, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_COMBINE[kind](name).alias(name) for name, (kind, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated ``buckets`` times.

    Use when BOTH sides are too big to broadcast and one key is hot
    enough that AQE's skew split (which needs a sort-merge join) is
    unavailable or insufficient. Replication multiplies the small
    side's shuffle volume by ``buckets`` — size accordingly.
    """
    if salt_source is None:
        salt_source = F.xxhash64(F.struct(*[F.col(c) for c in big.columns]))
    big_salted = big.withColumn("__salt", F.pmod(salt_source, F.lit(buckets)))
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return big_salted.join(small_rep, [on, "__salt"], "inner").drop("__salt")
