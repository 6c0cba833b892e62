"""Upsert / changelog-compaction operators.

The reference's only write-update semantics is the per-county
DELETE+append load (election_results_etl.py:114-131, SURVEY.md K2) —
a partition-level overwrite, covered by sources/io.py
write_partition_overwrite. These operators generalize that to ROW-level
upsert semantics, the other standard mutation shape in a lakehouse
pipeline (MERGE INTO in Delta/Iceberg; implemented here Spark-first on
plain DataFrames, no table-format dependency).

Scale notes:
  * ``merge_upsert`` is one anti-join + one union — when the update
    batch is small relative to the snapshot (the normal case) the
    anti-join broadcasts the update KEYS only, so the snapshot is
    never shuffled and the plan stays embarrassingly parallel.
  * ``latest_by_key`` compacts a changelog with one shuffle on the key
    and a per-key top-1 (WindowGroupLimit pushes the limit below the
    sort, so each map task keeps one candidate row per key before the
    exchange).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    snapshot: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_keys: bool = True,
    validate_unique: bool = True,
) -> DataFrame:
    """MERGE semantics: update matched rows, insert unmatched rows.

    Equivalent to ``MERGE INTO snapshot USING updates ON keys WHEN
    MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``.
    The update side wins wholesale (SCD type 1).

    ``validate_unique`` mirrors SQL MERGE's multiple-match error: with
    duplicate keys in ``updates`` a plain anti-join+union would emit
    duplicate rows where MERGE raises, so the guard is on by default
    (one aggregation pass over the update batch — cheap relative to the
    merge itself). Set ``broadcast_keys=False`` when the update batch is
    too large to broadcast its key set (rare; the anti-join then
    shuffles the snapshot on the key instead of staying map-side).
    """
    if validate_unique:
        from ..quality import assert_unique_key

        assert_unique_key(updates, list(keys), side="merge_upsert updates")
    key_set = updates.select(*keys).distinct()
    if broadcast_keys:
        key_set = F.broadcast(key_set)
    keep = snapshot.join(key_set, list(keys), "leftanti")
    return keep.unionByName(updates)


def latest_by_key(
    changelog: DataFrame, keys: Sequence[str], version_col: str, tiebreak: str
) -> DataFrame:
    """Compact a changelog to its latest row per key (last-writer-wins).

    ``version_col`` orders writes; ``tiebreak`` must make the order
    total (e.g. a unique id) so the survivor is deterministic.
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col(tiebreak).desc()
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc(
    changes: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a full CDC changelog — inserts/updates AND deletes — to
    produce the final table state: the last change per key wins, and a
    key whose LAST change is a tombstone is absent from the result.

    This is Debezium/DMS-apply semantics (the piece
    :func:`merge_upsert` and changelog compaction don't cover:
    tombstones must suppress earlier versions, not just replace them).
    One shuffle on the key, WindowGroupLimit keeps the per-key buffer
    at one row, and the tombstone filter runs AFTER the latest-pick so
    a delete followed by a re-insert resurrects the key correctly.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)
