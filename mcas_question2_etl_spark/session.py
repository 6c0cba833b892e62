"""SparkSession factory tuned for this engine.

Defaults target the local[N] test harness but the knobs are the ones that
matter on a real cluster too: AQE for runtime re-planning (skew joins,
partition coalescing), shuffle partitions sized to parallelism instead of
the 200 default, Arrow for any pandas interop, dynamic partition overwrite
to reproduce the reference's delete-partition+append load
(election_results_etl.py:114-131) without a delete round-trip.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mcas-question2-etl-spark",
    cpus: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism; shuffle partitions
    default to the same number so a local run has one post-shuffle
    partition per core (cluster deployments should size this to
    data volume / target partition size instead — see bench.py).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus
    )
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces post-shuffle partitions by BYTES, but several of
        # this engine's stages are CPU-dense per byte (exact-Jaccard /
        # edit-distance / hamming verify over candidate pairs: ~1 MB of
        # (id, id) rows fanning out to array-intersection work). With
        # the default 1 MB minimum those stages coalesce to ONE task and
        # serialize (measured: a 5.7 s-CPU verify stage of
        # minhash_neardup_full ran as a single task reading 830 KB) — on
        # any cluster, not just locally, because the byte heuristic
        # cannot see per-row cost. A 64 KB floor keeps byte-small
        # CPU-dense stages parallel while leaving real data volumes
        # untouched (any partition over a few MB is unaffected).
        # Parameterized for deployments that prefer the byte model.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
