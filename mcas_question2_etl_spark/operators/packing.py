"""Sequence packing: assign documents to fixed-token-budget training
bins (context windows) deterministically and in parallel.

A training pipeline turns a filtered corpus into batches of
``capacity``-token sequences. A globally-greedy packer is inherently
sequential, so at 100 TB the scalable shape is shard-local next-fit:

  1. shard each doc by a stable hash of its key (engine-portable md5,
     same family as operators/sampling.py hash_bucket) — shards are
     independent, so packing parallelizes to any cluster width;
  2. within a shard, order docs by key and take the running token sum;
     ``bin = floor((cumsum - n_tokens) / capacity)`` is next-fit
     packing where a doc that straddles a boundary starts the next bin
     (training loaders chunk long docs anyway).

The whole operator is one window aggregate per shard partition — a
single shuffle on the shard id, no Python. Determinism: membership and
order derive from the key hash only, never from partitioning or RNG,
so the same corpus packs identically on any engine/cluster — which is
also what makes it oracle-checkable in plain SQL.

No counterpart in the reference (its data model is relational-only);
this extends the engine for LLM-corpus construction alongside
operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket, hash_bucket_sql


def pack_next_fit(
    df: DataFrame,
    key_col: str,
    token_col: str,
    capacity: int = 2048,
    shards: int = 16,
) -> DataFrame:
    """Adds ``shard`` and ``bin`` columns assigning each row to a
    token-budget bin. Deterministic: (shard, bin) depend only on the
    key hash and the token counts, not on physical layout."""
    shard = hash_bucket(key_col, shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("__cum", F.sum(token_col).over(w))
        .withColumn(
            "bin",
            F.floor((F.col("__cum") - F.col(token_col)) / F.lit(capacity)),
        )
        .drop("__cum")
    )


def pack_next_fit_sql(
    key_col: str, token_col: str, capacity: int = 2048, shards: int = 16
) -> tuple[str, str]:
    """DuckDB twins of the ``shard`` and ``bin`` expressions (the bin
    expression references ``shard`` and must run in a later CTE)."""
    shard = hash_bucket_sql(key_col, shards)
    cum = (
        f"SUM({token_col}) OVER (PARTITION BY shard ORDER BY {key_col} "
        f"ROWS UNBOUNDED PRECEDING)"
    )
    return shard, f"CAST(FLOOR(({cum} - {token_col}) / {capacity}) AS BIGINT)"


def bin_fill_report(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-(shard, bin) fill stats — the packing-efficiency check a
    corpus build runs before writing batches."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("long").alias("sum_tokens"),
    )
