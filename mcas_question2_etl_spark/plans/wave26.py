"""Wave-26 extension specs: per-epoch deterministic shuffle order (the
training-dataloader permutation) and cross-source shared-opening
provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.ranking import with_global_row_number
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_EPOCHS = (0, 1)


@_spec(
    "epoch_shuffle_order",
    f"""
    WITH keyed AS (
      SELECT e.epoch, d.doc_id,
             md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(e.epoch AS VARCHAR))
               AS sort_key
      FROM documents d
      CROSS JOIN (SELECT unnest([{", ".join(map(str, _EPOCHS))}]) AS epoch) e
    ),
    ordered AS (
      SELECT epoch, doc_id,
             CAST(row_number() OVER (PARTITION BY epoch ORDER BY sort_key)
                  AS BIGINT) AS pos
      FROM keyed
    )
    SELECT CAST(epoch AS INTEGER) AS epoch,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id * pos) AS BIGINT) AS perm_checksum,
           CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc
    FROM ordered GROUP BY 1
    """,
    "training-data op — per-epoch deterministic shuffle: the "
    "dataloader permutation done ENGINE-SIDE (order by "
    "md5(doc_id#epoch)), so every worker, restart, and engine agrees "
    "on epoch ordering without materializing an index. The "
    "position-weighted checksum SUM(doc_id*pos) pins the ENTIRE "
    "permutation per epoch in one number (different epochs -> "
    "different checksums, re-runs -> identical). Global positions "
    "use the two-phase distributed row-number — no single-task "
    "window. In production the same sort key feeds "
    "write_range_partitioned to lay shards out in epoch order",
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    epochs = spark.createDataFrame([(e,) for e in _EPOCHS], "epoch int")
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws("#", F.col("doc_id").cast("string"), F.col("epoch").cast("string"))
        ).alias("sort_key"),
    )
    ordered = with_global_row_number(
        keyed.repartition("epoch"), ["epoch", "sort_key"], out_col="gpos"
    )
    # gpos is the position in the (epoch, key) total order; per-epoch
    # position = gpos - (rows in earlier epochs), a broadcast offset
    offs = ordered.groupBy("epoch").agg(F.min("gpos").alias("base"))
    per_epoch = ordered.join(F.broadcast(offs), "epoch").withColumn(
        "pos", F.col("gpos") - F.col("base") + 1
    )
    return per_epoch.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("doc_id") * F.col("pos")).alias("perm_checksum"),
        F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("first_doc"),
    )


@_spec(
    "cross_source_shared_openings",
    """
    WITH fp AS (
      SELECT doc_id, source, md5(substring(text, 1, 40)) AS f FROM documents
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
      WHERE a.source <> b.source
    )
    SELECT LEAST(source_a, source_b) AS source_x,
           GREATEST(source_a, source_b) AS source_y,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
    FROM pairs GROUP BY 1, 2
    """,
    "training-data op — cross-source shared-opening provenance: "
    "which crawl sources ship documents with IDENTICAL openings "
    "(md5 of the first 40 chars, the boilerplate-header fingerprint "
    "— this corpus has no full-body cross-source dups, openings DO "
    "collide) — the overlap matrix that flags shared templates/"
    "mirrors before paying for near-dup passes. Only 32-hex "
    "fingerprints shuffle, never bodies; pair cost follows "
    "duplicate mass, not corpus size",
)
def cross_source_shared_openings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", "source", F.md5(F.substring("text", 1, 40)).alias("f"))
    a = fp.select(
        F.col("f"), F.col("doc_id").alias("a_id"), F.col("source").alias("source_a")
    )
    b = fp.select(
        F.col("f"), F.col("doc_id").alias("b_id"), F.col("source").alias("source_b")
    )
    pairs = (
        a.join(b, "f")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("source_a") != F.col("source_b"))
        )
    )
    return pairs.groupBy(
        F.least("source_a", "source_b").alias("source_x"),
        F.greatest("source_a", "source_b").alias("source_y"),
    ).agg(F.count(F.lit(1)).alias("n_dup_pairs"))
