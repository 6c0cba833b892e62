"""Wave-25 extension specs: dataset shard manifests (the reproducible
export contract) and an LSH quality report (measured precision/recall
of the scale path against the exact kernel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup
from ..operators.sampling import hash_bucket, hash_bucket_sql
from ..registry import QuerySpec
from .data_pipeline import _SHINGLES_SQL

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_N_SHARDS = 16
#: 48-bit md5 head: wide enough to make collisions in a checksum-sum
#: negligible, narrow enough that BIGINT sums cannot overflow
_CKSUM = "cast(conv(substring(md5(text), 1, 12), 16, 10) as bigint)"
_CKSUM_SQL = "CAST(('0x' || substring(md5(text), 1, 12)) AS BIGINT)"


@_spec(
    "shard_manifest",
    f"""
    SELECT {hash_bucket_sql('doc_id', _N_SHARDS)} AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({_CKSUM_SQL}) AS BIGINT) AS content_checksum,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY 1
    """,
    "training-data op — shard manifest generation: the export "
    "contract of a training corpus (WebDataset/streaming-loader "
    "shape). Shard membership is the stable md5 bucket (adding "
    "shards never reassigns docs between existing ones in a rebuild "
    "with the same count), and each shard row carries doc count, "
    "char volume, and an order-independent content checksum (SUM of "
    "48-bit md5 heads) — enough for a consumer to verify a shard "
    "without reading its neighbors. One aggregation, one shuffle of "
    "(shard, partials)",
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        hash_bucket("doc_id", _N_SHARDS).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.expr(_CKSUM)).alias("content_checksum"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_SAMPLE_MOD = 5
#: absolute cap on the verification sample: the truth kernel is
#: all-pairs (quadratic), so the sample must stay FIXED-size as the
#: corpus grows — ids < 1000 keeps sf0.001/sf0.01 samples identical
#: (every doc id there is < 1000) and bounds sf0.1+ to ~200 docs
_SAMPLE_CAP = 1000
_J_THRESH = 0.6


@_spec(
    "lsh_quality_report",
    f"""
    WITH sample AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_SAMPLE_MOD} = 0 AND doc_id < {_SAMPLE_CAP}
        AND length(text) >= 3
    ),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM sample),
    truth AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / (length(a.shingles) + length(b.shingles)
               - length(list_intersect(a.shingles, b.shingles))) >= {_J_THRESH}
    ),
    sig AS (
      SELECT doc_id, {dedup.minhash_signature_sql('shingles')} AS sig
      FROM sh WHERE length(shingles) > 0
    ),
    all_bands AS (
      SELECT doc_id, i AS band_idx,
             CAST(sig[2*i + 1] AS VARCHAR) || ':' || CAST(sig[2*i + 2] AS VARCHAR)
               AS band_key
      FROM sig, unnest([0, 1, 2, 3]) AS t(i)
    ),
    bands AS (
      SELECT doc_id, band_idx, band_key
      FROM (SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_key) AS bn
            FROM all_bands)
      WHERE bn <= 100
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    tp AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM tp) AS BIGINT) AS n_true_positives,
           (SELECT COUNT(*) FROM tp)
             / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) AS precision,
           (SELECT COUNT(*) FROM tp)
             / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE) AS recall
    """,
    "training-data op — LSH quality report: measured precision/recall "
    "of the banded-LSH candidate generator against the exact Jaccard "
    "kernel on a deterministic sample — the trust-the-scale-path "
    "number you recompute whenever the corpus distribution shifts "
    "(banding parameters tuned on last year's crawl can silently "
    "lose recall on this year's). All-pairs truth runs ONLY on the "
    "bounded sample; candidates come from the production banding "
    "(same guard). Exact integer counts; ratios divide at the end",
)
def lsh_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(
        (F.col("doc_id") % _SAMPLE_MOD == 0)
        & (F.col("doc_id") < _SAMPLE_CAP)
        & (F.length("text") >= 3)
    )
    sh = sample.select(
        "doc_id", dedup.char_ngrams("text", 3).alias("shingles")
    ).localCheckpoint(eager=False)
    a = sh.select(
        F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh")
    )
    b = sh.select(
        F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    truth = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .filter((inter.cast("double") / union) >= _J_THRESH)
        .select("a_id", "b_id")
        .localCheckpoint(eager=False)
    )
    cand = dedup.minhash_lsh_candidates(
        sample, max_bucket=100
    ).localCheckpoint(eager=False)
    tp = cand.join(truth, ["a_id", "b_id"], "leftsemi")
    n_truth = truth.count()
    n_cand = cand.count()
    n_tp = tp.count()
    return spark.createDataFrame(
        [(n_truth, n_cand, n_tp, n_tp / n_cand, n_tp / n_truth)],
        "n_truth long, n_candidates long, n_true_positives long, "
        "precision double, recall double",
    )
