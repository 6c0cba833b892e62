"""Wave-23 extension specs: incremental near-dup (batch vs corpus
LSH index), foreign-key orphan audit, and Gini inequality of the
token distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup
from ..operators.ranking import with_global_row_number
from ..registry import QuerySpec
from .data_pipeline import _SHINGLES_SQL

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# --------------------------------------------------------------------------
# incremental near-dup: batch (doc_id % 10 == 7) vs corpus (the rest)
# --------------------------------------------------------------------------

_BANDS_SQL = f"""
      SELECT doc_id, i AS band_idx,
             CAST(sig[2*i + 1] AS VARCHAR) || ':' || CAST(sig[2*i + 2] AS VARCHAR)
               AS band_key
      FROM (
        SELECT doc_id, {dedup.minhash_signature_sql('shingles')} AS sig
        FROM (
          SELECT doc_id, {_SHINGLES_SQL} AS shingles
          FROM documents WHERE length(text) >= 3 AND ({{side}})
        ) WHERE length(shingles) > 0
      ), unnest([0, 1, 2, 3]) AS t(i)
"""


@_spec(
    "neardup_incremental_batch",
    f"""
    WITH cb_all AS ({_BANDS_SQL.format(side="doc_id % 10 <> 7")}),
    cb AS (
      SELECT doc_id, band_idx, band_key
      FROM (SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_key) AS bn
            FROM cb_all)
      WHERE bn <= 100
    ),
    bb AS ({_BANDS_SQL.format(side="doc_id % 10 = 7")}),
    pairs AS (
      SELECT DISTINCT bb.doc_id AS batch_id, cb.doc_id AS corpus_id
      FROM bb JOIN cb ON bb.band_idx = cb.band_idx
                     AND bb.band_key = cb.band_key
    )
    SELECT batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_collisions,
           CAST(SUM(corpus_id) AS BIGINT) AS sum_corpus_ids
    FROM pairs GROUP BY 1
    """,
    "training-data op — INCREMENTAL near-dup "
    "(operators/dedup.py minhash_lsh_between): a new batch bands "
    "against the stored corpus LSH index (minhash_bands — the "
    "materialized (id, band_idx, band_key) table), so a daily ingest "
    "costs O(batch bands + matched buckets) instead of re-deduping "
    "the corpus; the corpus-side degenerate-bucket guard mirrors the "
    "self-join case. Completes dedup_incremental_batch (exact "
    "fingerprints) with the NEAR-dup incremental path",
)
def neardup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    batch = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    pairs = dedup.minhash_lsh_between(batch, corpus, max_bucket=100)
    return pairs.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_collisions"),
        F.sum("corpus_id").alias("sum_corpus_ids"),
    )


#: the star schema's FK edges: (fact, fk, dim, pk)
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@_spec(
    "fk_orphan_report",
    "\nUNION ALL\n".join(
        f"""
        SELECT '{fact}.{fk}' AS edge,
               CAST((SELECT COUNT(*) FROM {fact}) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_orphans
        FROM {fact} f
        WHERE f.{fk} IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM {dim} d WHERE d.{pk} = f.{fk})
        """
        for fact, fk, dim, pk in _FK_EDGES
    ),
    "extension — referential-integrity audit: orphan counts for every "
    "FK edge of the star schema in one report (left-anti probes; each "
    "dim side broadcasts, so no fact table ever shuffles). The "
    "data-quality gate that runs before any join-heavy workload — a "
    "nonzero row here is why a validated join (quality.py) would "
    "throw later. Extends the expectations suite "
    "(operators/expectations.py) from per-table to cross-table "
    "contracts",
)
def fk_orphan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for fact, fk, dim, pk in _FK_EDGES:
        f = load_table(spark, sf_dir, fact)
        d = load_table(spark, sf_dir, dim)
        orphans = (
            f.filter(F.col(fk).isNotNull())
            .join(F.broadcast(d.select(F.col(pk).alias(fk))), fk, "leftanti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        row = (
            f.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(orphans)
            .select(
                F.lit(f"{fact}.{fk}").alias("edge"), "n_rows", "n_orphans"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@_spec(
    "token_gini_inequality",
    """
    WITH x AS (
      SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
    ),
    ranked AS (
      SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             SUM(v) OVER () AS s
      FROM x
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(s) AS DOUBLE) AS total_chars,
           SUM((2 * i - n - 1) * v) / (MAX(n) * MAX(s)) AS gini
    FROM ranked
    """,
    "extension — Gini coefficient of the per-document length "
    "distribution (the corpus-inequality number behind 'head domains "
    "dominate the token budget'): computed with the exact sorted-rank "
    "formula sum((2i-n-1)x_i)/(n*sum x). The global rank uses the "
    "TWO-PHASE distributed row-number (operators/ranking.py — range "
    "shuffle + per-partition windows + broadcast offsets), so no "
    "single-task global window even at corpus scale; ties in v are "
    "harmless because the formula's tie-order term telescopes",
)
def token_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    x = docs.select(
        F.col("n_chars").cast("double").alias("v"), F.col("doc_id")
    )
    ranked = with_global_row_number(x, ["v", "doc_id"], out_col="i")
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n_docs"),
            F.max("s").cast("double").alias("total_chars"),
            (
                F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("v"))
                / (F.max("n") * F.max("s"))
            ).alias("gini"),
        )
    )
