"""Round-robin fan-out for CPU-bound kernel stages.

The bench-scale parquet inputs read as ONE split (single row group), so
every map stage that precedes the first shuffle — and every
BroadcastNestedLoopJoin whose stream side comes straight off a scan or
a tiny aggregate — runs on a single core no matter how many the box
has. For cheap projections that is irrelevant; for quadratic pair
kernels (repeated-medians, diagonal dot products, probe-set scans) and
heavyweight per-row expressions (space-filling-curve folds) the stage
serializes on one task while 31 cores idle. `fan_out` spreads the tiny
input across the cluster's parallelism first: the shuffled rows are a
few dozen bytes each, and at 100 TB the kernel fleet scales with
executors instead of with the accidental input split count — the same
reasoning as plans/ml_geo_media._fan_out for the codec kernels.

Only use it in front of work that is superlinear in the fanned-out
rows (or heavy per row); a plain scan-project-aggregate is better off
without the extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin ``df`` across ``parts`` partitions (defaults to the
    session's ``defaultParallelism`` — scale-adaptive, never a constant
    tuned to one box).

    CONDITIONAL: when the input already plans at least that many
    partitions (the normal case at scale, where the scan has thousands
    of splits), this is a no-op — the repartition exists to fix the
    small-input edge case where one parquet split serializes a heavy
    kernel on one core, not to funnel a large table through an extra
    full shuffle. ``df.rdd.getNumPartitions()`` only plans (no job)."""
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
