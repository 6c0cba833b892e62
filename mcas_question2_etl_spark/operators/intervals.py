"""Interval-overlap join: pair up rows of two interval tables that
overlap in time, WITHOUT a cartesian product.

The classic failure mode of ``l.start <= r.end AND r.start <= l.end``
in any engine is a nested-loop/cartesian plan (no equi-key). The scale
path bins both sides onto a fixed time grid: an interval covers
``floor(start/w) .. floor(end/w)``, every covered bin becomes an
equi-join key, and each truly-overlapping pair is emitted EXACTLY once
by keeping only the canonical bin ``max(floor(l.start/w),
floor(r.start/w))`` (the first grid cell the two intervals share). No
``distinct`` pass, no duplicate pairs, and the join is a plain hash
join on a bigint key that AQE can re-balance.

Cost model: bins-per-interval ~= duration/w + 1, so pick ``w`` near the
typical interval length; pairs are then found in O(n·dups-per-bin)
instead of O(n·m). This is the interval analogue of the grid trick in
``operators/spatial.py`` and the band join in ``plans/extensions.py``
(range_band_join).

Reference parity: the reference has no interval join (its pandas joins
are all equi-key, e.g. dags/school_outcomes_etl.py merge chains); this
is a SURVEY §2 "free in Spark" extension in the same family as
range_band_join, needed for session/promo attribution at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bin(col: Column, width: int) -> Column:
    return F.floor(col / F.lit(width))


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """All (left, right) pairs with ``[l_start,l_end]`` overlapping
    ``[r_start,r_end]`` (closed intervals, same integer unit — e.g.
    epoch micros). Columns of both inputs must be disjoint.

    Each side explodes to its covered grid bins (sequence + explode in
    the scan stage), the pair space is formed by an equi hash join on
    the bin, and the canonical-bin filter deduplicates without a
    distinct. Output = left columns ++ right columns.
    """
    lb = left.withColumn(
        "__lbin",
        F.explode(F.sequence(_bin(F.col(l_start), bin_width), _bin(F.col(l_end), bin_width))),
    )
    rb = right.withColumn(
        "__rbin",
        F.explode(F.sequence(_bin(F.col(r_start), bin_width), _bin(F.col(r_end), bin_width))),
    )
    joined = lb.join(rb, lb["__lbin"] == rb["__rbin"])
    canonical = F.greatest(
        _bin(F.col(l_start), bin_width), _bin(F.col(r_start), bin_width)
    )
    return (
        joined.filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__lbin") == canonical)
        )
        .drop("__lbin", "__rbin")
    )


def overlap_join_sql(
    left_cte: str,
    right_cte: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
) -> str:
    """DuckDB oracle twin: the PLAIN theta join (no grid). Equality of
    results proves the binned plan emits each overlapping pair exactly
    once and loses none."""
    return (
        f"{left_cte} l JOIN {right_cte} r"
        f" ON l.{l_start} <= r.{r_end} AND r.{r_start} <= l.{l_end}"
    )


def coalesce_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start: str,
    end: str,
) -> DataFrame:
    """Merge overlapping/touching intervals per key into disjoint
    covered periods — the interval-union op behind downtime reports,
    busy-period stitching, and span-coverage accounting.

    Classic two-window shape sharing ONE shuffle on the key: order by
    (start, end), carry the running max of ``end``, open a new group
    whenever a row starts strictly after everything seen so far ended,
    then aggregate each group to its envelope. Output: one row per
    merged interval (keys, period_id, start, end, n_merged).

    The running max must EXCLUDE the current row (lag of the running
    max) — comparing against an inclusive max would never open a new
    group on rows that extend the current one.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(start), F.col(end))
    wrun = w.rowsBetween(Window.unboundedPreceding, -1)
    flagged = df.withColumn(
        "__prev_max_end", F.max(F.col(end)).over(wrun)
    ).withColumn(
        "__new",
        F.when(
            F.col("__prev_max_end").isNull()
            | (F.col(start) > F.col("__prev_max_end")),
            1,
        ).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = flagged.withColumn("period_id", F.sum("__new").over(wsum))
    return grouped.groupBy(*keys, "period_id").agg(
        F.min(start).alias("period_start"),
        F.max(end).alias("period_end"),
        F.count(F.lit(1)).alias("n_merged"),
    )
