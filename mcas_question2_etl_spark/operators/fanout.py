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

#: Above this Catalyst size estimate the partition probe (and the
#: round-robin shuffle it gates) is skipped outright: a plan this big
#: either already has enough splits or must not pay an extra full
#: shuffle, and with AQE the probe itself is not free (see below).
_FAN_OUT_PROBE_MAX_BYTES = 1 << 30


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin ``df`` across ``parts`` partitions (defaults to the
    session's ``defaultParallelism`` — scale-adaptive, never a constant
    tuned to one box).

    CONDITIONAL, two guards (ADVICE r8):

    * Catalyst size estimate first — when the optimized plan is
      estimated above ``_FAN_OUT_PROBE_MAX_BYTES`` (or no estimate is
      available), return the input untouched. This matters because the
      partition-count probe below is NOT free under AQE: converting a
      plan that contains exchanges to an RDD materializes the upstream
      query stages eagerly, and those stages are not reused by the
      later action. The estimate guard keeps that double execution
      bounded to provably small inputs and keeps a 100 TB table from
      ever paying either the probe or the shuffle.
    * Partition-count probe second — when the (small) input already
      plans at least ``parts`` partitions, this is a no-op; the
      repartition exists to fix the small-input edge case where one
      parquet split serializes a heavy kernel on one core.
    """
    from .dedup import _plan_size_bytes

    n = parts or df.sparkSession.sparkContext.defaultParallelism
    size = _plan_size_bytes(df)
    if size is None or size > _FAN_OUT_PROBE_MAX_BYTES:
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
