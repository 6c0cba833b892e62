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


#: the two graded banding settings: the oracle-cheap test family and
#: the production family (dedup.MH_PROD_*). Design recall at the
#: j=0.9 near-dup threshold is the closed-form S-curve 1-(1-j^r)^b —
#: a pinned constant on both engines, documenting what the banding
#: PROMISES while the measured columns show what it DELIVERS on this
#: corpus at the specs' j>=0.6 gate.
_SETTINGS = [
    ("test_8p_4x2", dedup.MH_PARAMS, dedup.MH_BAND_ROWS),
    (
        "prod_128p_16x8",
        dedup.mh_family(dedup.MH_PROD_PERMS),
        dedup.MH_PROD_BAND_ROWS,
    ),
]


def _design_recall(params, band_rows: int, j: float = 0.9) -> float:
    b = len(params) // band_rows
    return round(1.0 - (1.0 - j**band_rows) ** b, 6)


def _setting_ctes(label: str, params, band_rows: int) -> str:
    """Per-setting candidate CTE chain (sig -> bands -> cand -> tp)."""
    n_bands = len(params) // band_rows
    idxs = ", ".join(str(i) for i in range(n_bands))
    key = " || ':' || ".join(
        f"CAST(sig[{band_rows}*i + {r + 1}] AS VARCHAR)"
        for r in range(band_rows)
    )
    sig = dedup.minhash_signature_sql("shingles", params)
    return f"""
    sig_{label} AS (
      SELECT doc_id, {sig} AS sig FROM sh WHERE length(shingles) > 0
    ),
    allb_{label} AS (
      SELECT doc_id, i AS band_idx, {key} AS band_key
      FROM sig_{label}, unnest([{idxs}]) AS t(i)
    ),
    bands_{label} AS (
      SELECT doc_id, band_idx, band_key
      FROM (SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_key) AS bn
            FROM allb_{label})
      WHERE bn <= 100
    ),
    cand_{label} AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands_{label} a JOIN bands_{label} b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    tp_{label} AS (SELECT * FROM cand_{label} INTERSECT SELECT * FROM truth)"""


def _setting_row_sql(label: str, design: float) -> str:
    return f"""
    SELECT '{label}' AS setting,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM cand_{label}) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM tp_{label}) AS BIGINT)
             AS n_true_positives,
           (SELECT COUNT(*) FROM tp_{label})
             / NULLIF(CAST((SELECT COUNT(*) FROM cand_{label}) AS DOUBLE), 0)
             AS precision,
           (SELECT COUNT(*) FROM tp_{label})
             / NULLIF(CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 0)
             AS recall,
           CAST({design!r} AS DOUBLE) AS design_recall_at_090"""


_LSH_ORACLE = f"""
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
    ),{",".join(_setting_ctes(lb, p, r) for lb, p, r in _SETTINGS)}
    {" UNION ALL ".join(_setting_row_sql(lb, _design_recall(p, r)) for lb, p, r in _SETTINGS)}
"""


@_spec(
    "lsh_quality_report",
    _LSH_ORACLE,
    "training-data op — LSH quality report at BOTH banding settings "
    "(test 8-perm 4x2 and production 128-perm 16x8, "
    "operators/dedup.mh_family): measured precision/recall of each "
    "candidate generator against the exact Jaccard kernel on a "
    "deterministic sample, plus the closed-form S-curve recall each "
    "banding guarantees at the j=0.9 near-dup threshold — the "
    "trust-the-scale-path numbers you recompute whenever the corpus "
    "distribution shifts. All-pairs truth runs ONLY on the bounded "
    "sample; candidates come from the production banding machinery "
    "(same bucket guard). Exact integer counts; ratios divide at "
    "the end",
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
    n_truth = truth.count()
    rows = []
    for label, params, band_rows in _SETTINGS:
        cand = dedup.minhash_lsh_candidates(
            sample, max_bucket=100, params=params, band_rows=band_rows
        ).localCheckpoint(eager=False)
        n_cand = cand.count()
        n_tp = cand.join(truth, ["a_id", "b_id"], "leftsemi").count()
        rows.append(
            (
                label,
                n_truth,
                n_cand,
                n_tp,
                n_tp / n_cand if n_cand else None,
                n_tp / n_truth if n_truth else None,
                _design_recall(params, band_rows),
            )
        )
    return spark.createDataFrame(
        rows,
        "setting string, n_truth long, n_candidates long, "
        "n_true_positives long, precision double, recall double, "
        "design_recall_at_090 double",
    )
