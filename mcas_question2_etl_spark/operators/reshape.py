"""Reshape operators (SURVEY.md §2.6 R1-R3) — the reference's signature
transforms: pandas multi-value pivot, list-column explode, and tidyr
separate+pivot_longer.

Scale notes: pivot with explicit ``pivot_values`` avoids Spark's extra
distinct-values job and yields a fixed output schema; explode is a
narrow (no-shuffle) generator expression; the unpivot path uses
``posexplode`` which is likewise narrow.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..quality import assert_unique_key


def pivot_wide(
    df: DataFrame,
    index: list[str],
    pivot_col: str,
    values: dict[str, Column],
    pivot_values: list[str] | None = None,
    assert_unique: bool = False,
) -> DataFrame:
    """R1 — long->wide pivot with `{value}_{pivotval}` column naming.

    Reference: ``mcas_df.pivot(index='district_code', columns='subject',
    values=[...])`` + MultiIndex flatten to ``num_meets_exceeds_ELA``
    (school_outcomes_etl.py:113-119). Spark names pivoted columns
    ``{pivotval}_{alias}``; we rename to the reference's
    ``{alias}_{pivotval}`` (lowercased) for parity.

    pandas ``.pivot`` raises on duplicate (index, column) pairs where
    Spark's ``first()`` would silently pick one (SURVEY §7.4) —
    ``assert_unique=True`` restores the reference's fail-fast semantics.
    """
    if assert_unique:
        assert_unique_key(df, index + [pivot_col], side="pivot input")
    pv = df.groupBy(*index).pivot(pivot_col, pivot_values)
    aggs = [expr.alias(name) for name, expr in values.items()]
    wide = pv.agg(*aggs)
    renames = {}
    if len(values) == 1:
        # single agg: Spark names pivoted columns bare `{pivotval}`
        (value_name,) = values
        for c in wide.columns:
            if c not in index:
                renames[c] = f"{value_name}_{c}".lower()
    else:
        # multi agg: Spark names them `{pivotval}_{alias}`
        for c in wide.columns:
            m = re.match(
                r"^(.+?)_(" + "|".join(re.escape(v) for v in values) + r")$", c
            )
            if m:
                renames[c] = f"{m.group(2)}_{m.group(1)}".lower()
    for old, new in renames.items():
        wide = wide.withColumnRenamed(old, new)
    return wide


def explode_list(
    df: DataFrame,
    col: str,
    sep: str,
    out_col: str,
    keep_input: bool = False,
    outer: bool = False,
) -> DataFrame:
    """R2 — split a delimited string column and explode to one row per
    element (dags/district_gis_etl.py:46-47). Narrow op: no shuffle.

    ``outer=True`` matches pandas ``.explode`` on a null list: the row
    survives with a null element (the reference relies on this — its
    null-MEMBERLIST rows flow into the coalesce at
    dags/district_gis_etl.py:51). Spark's plain ``explode`` would drop
    them.
    """
    gen = F.explode_outer if outer else F.explode
    split_col = F.when(F.col(col).isNotNull(), F.split(F.col(col), re.escape(sep)))
    exploded = df.withColumn(out_col, gen(split_col))
    return exploded if keep_input else exploded.drop(col)


def separate_unpivot(
    df: DataFrame,
    col: str,
    sep: str,
    n: int,
    names_to: str = "position",
    values_to: str = "value",
    drop_null: bool = True,
) -> DataFrame:
    """R3 — bounded split -> unpivot -> NA-filter.

    Reference: ``separate(col, into=c(town_1..town_8), sep=', ',
    fill='right')`` then ``pivot_longer`` then ``filter(!is.na(...))``
    (create_school_town_lookup.Rmd:34-38; 28-way run_analysis.Rmd:40-44).

    Implemented as ``posexplode(slice(split(col), 1, n))``: the
    separate/fill-right nulls that pivot_longer would emit are exactly
    the rows the NA-filter drops, so posexplode (which emits only
    existing elements) is row-for-row identical — and stays narrow.
    """
    if not drop_null:
        raise NotImplementedError(
            "reference always drops the fill-right NAs; keep_null form not needed"
        )
    arr = F.slice(F.split(F.col(col), re.escape(sep)), 1, n)
    return df.select(
        *[c for c in df.columns if c != col],
        F.posexplode(arr).alias("__pos", values_to),
    ).withColumn(names_to, (F.col("__pos") + 1).cast("int")).drop("__pos")
