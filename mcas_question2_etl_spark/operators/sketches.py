"""Mergeable sketch aggregates (Apache DataSketches HLL, JVM-native).

The reference has no approximate aggregation — its N=324-town analysis
(run_analysis.Rmd:212) never needs one. At the 100 TB scale this engine
targets, exact ``COUNT(DISTINCT)`` is the classic scale cliff: it
re-shuffles the raw keys for every grouping the analyst asks for. The
standard OLAP answer (Dremel/Druid/BigQuery-style) is a *mergeable*
sketch: aggregate each partition into a fixed-size HLL once, then any
coarser rollup is a cheap union of sketches — no rescan, no re-shuffle
of raw keys, and the sketch table itself is tiny (2^lg_k bytes/group).

Spark ships DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, JVM whole-stage codegen —
no Python in the loop), so all three operators below stay in the fast
path and map-side partial aggregation applies to the sketch build.

Error contract: relative error ~= 1.04 / sqrt(2^lg_k); lg_k=14 ->
~0.8% typical, and below ~2.5k distincts the sketch is in sparse mode
and *exact*. The oracle-checked specs assert the contract (estimate
within tolerance of DuckDB's exact distinct), not the raw estimate,
since HLL implementations differ across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 14


def hll_distinct(
    df: DataFrame, group_keys: Sequence[str], col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Approximate distinct count of ``col`` per group, one pass.

    One shuffle on ``group_keys`` with map-side partial sketches —
    the raw key column never crosses the wire, only fixed-size sketch
    buffers do. Output: group_keys + ``approx_distinct`` (long).
    """
    return df.groupBy(*group_keys).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col), F.lit(lg_k))
        ).alias("approx_distinct")
    )


def hll_sketch_table(
    df: DataFrame, fine_keys: Sequence[str], col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """Materialize a mergeable sketch per fine-grained key.

    This is the "pre-aggregate once" half of the pattern: persist this
    tiny table (binary sketch column, 2^lg_k bytes max per row) and
    every coarser distinct-count rollup becomes `hll_rollup` over it —
    at 100 TB you scan the raw data exactly once, ever.
    """
    return df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("hll_sketch")
    )


def hll_rollup(
    sketches: DataFrame, coarse_keys: Sequence[str], sketch_col: str = "hll_sketch"
) -> DataFrame:
    """Merge fine-grained sketches up to ``coarse_keys`` and estimate.

    Sketch union is lossless w.r.t. the sketch's own error bound:
    union(sketch(A), sketch(B)) == sketch(A ∪ B) for same lg_k, so the
    rollup estimate carries the same error contract as a direct build.
    """
    return sketches.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "approx_distinct"
        )
    )


def heavy_hitters(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """EXACT frequent items (count > support * N) via the two-pass
    candidates-then-verify pattern.

    Pass 1 (``df.stat.freqItems``, Karp/Misra-Gries style) finds every
    candidate in ONE scan with NO shuffle of raw keys — the sketch has
    no false negatives above ``support``, and its candidate set is
    bounded by ~1/support items regardless of N, so collecting it to
    the driver is safe at any scale. Pass 2 exact-counts only rows
    matching the broadcast candidate set, so the groupBy shuffles at
    most the heavy keys' rows. Net: exact answer, and the full-key
    shuffle an exact GROUP BY ... HAVING would need never happens.
    """
    total = df.count()
    [row] = df.stat.freqItems([col], support).collect()
    cands = [c for c in row[0] if c is not None]
    if not cands:
        return (
            df.select(col)
            .limit(0)
            .withColumn("cnt", F.lit(0).cast("long"))
        )
    return (
        df.filter(F.col(col).isin(cands))
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > support * total)
    )
