"""Wave-18 extension specs: Hilbert-vs-Morton pruning probe (measured
layout win), PSI distribution-drift monitoring, and Matryoshka-prefix
embedding recall (can we serve on a dim-prefix?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import hilbert, zorder
from ..operators.similarity import cosine_sql, quantize, quantize_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# --------------------------------------------------------------------------
# Hilbert vs Morton pruning probe: same machinery as wave9's
# zorder_pruning_stats, now comparing the two curve layouts head to head
# --------------------------------------------------------------------------

_HP_BITS = 10
_HP_SHIFT = 14  # bucket = key div 2^14 -> 64 buckets over a 2^20 key space
_HP_BOX = (100, 300, 400, 600)  # x_lo, x_hi, y_lo, y_hi


def _hp_oracle() -> str:
    x_lo, x_hi, y_lo, y_hi = _HP_BOX
    hil = hilbert.hilbert_oracle_sql(
        "pts", "x", "y", "x, y", _HP_BITS, key_alias="key"
    )
    return f"""
    WITH pts AS (
      SELECT CAST(l_partkey % {1 << _HP_BITS} AS BIGINT) AS x,
             CAST(l_orderkey % {1 << _HP_BITS} AS BIGINT) AS y
      FROM lineitem
    ),
    hkeys AS ({hil}),
    layouts AS (
      SELECT 'hilbert' AS layout, key // {1 << _HP_SHIFT} AS bucket, x, y
      FROM hkeys
      UNION ALL
      SELECT 'zorder' AS layout,
             CAST({zorder.morton_key_sql('x', 'y', _HP_BITS)} AS BIGINT)
               // {1 << _HP_SHIFT} AS bucket, x, y
      FROM pts
    ),
    per_bucket AS (
      SELECT layout, bucket,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y,
             COUNT(*) AS n_rows,
             SUM(CASE WHEN x BETWEEN {x_lo} AND {x_hi}
                       AND y BETWEEN {y_lo} AND {y_hi} THEN 1 ELSE 0 END) AS n_match
      FROM layouts GROUP BY 1, 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN min_x <= {x_hi} AND max_x >= {x_lo}
                          AND min_y <= {y_hi} AND max_y >= {y_lo}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets_hit,
           CAST(SUM(CASE WHEN min_x <= {x_hi} AND max_x >= {x_lo}
                          AND min_y <= {y_hi} AND max_y >= {y_lo}
                         THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching
    FROM per_bucket GROUP BY 1
    """


@_spec(
    "hilbert_pruning_stats",
    _hp_oracle(),
    "extension — head-to-head layout probe: bucket the fact table "
    "under the Hilbert key and the Morton key (operators/hilbert.py / "
    "zorder.py), compute per-bucket min/max envelopes (exactly the "
    "parquet footer stats a file would carry) and count buckets/rows "
    "a 2-D box predicate must scan under each. The measured basis for "
    "choosing hilbert_by over zorder_by before paying for a layout "
    "rewrite. All-integer arithmetic, exact oracle (recursive-CTE "
    "Hilbert twin), one shuffle per layout branch",
)
def hilbert_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    x_lo, x_hi, y_lo, y_hi = _HP_BOX
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.pmod("l_partkey", F.lit(1 << _HP_BITS)).cast("long").alias("x"),
        F.pmod("l_orderkey", F.lit(1 << _HP_BITS)).cast("long").alias("y"),
    )
    layouts = pts.withColumn(
        "__k", hilbert.hilbert_key("x", "y", _HP_BITS)
    ).select(
        F.lit("hilbert").alias("layout"),
        F.expr(f"__k div {1 << _HP_SHIFT}").alias("bucket"),
        "x",
        "y",
    ).unionByName(
        pts.withColumn(
            "__k", zorder.morton_key(F.col("x"), F.col("y"), _HP_BITS)
        ).select(
            F.lit("zorder").alias("layout"),
            F.expr(f"__k div {1 << _HP_SHIFT}").alias("bucket"),
            "x",
            "y",
        )
    )
    in_box = F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
    per_bucket = layouts.groupBy("layout", "bucket").agg(
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(in_box.cast("int")).alias("n_match"),
    )
    hit = (
        (F.col("min_x") <= x_hi)
        & (F.col("max_x") >= x_lo)
        & (F.col("min_y") <= y_hi)
        & (F.col("max_y") >= y_lo)
    )
    return per_bucket.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(hit.cast("int")).cast("long").alias("n_buckets_hit"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matching"),
    )


# --------------------------------------------------------------------------
# PSI distribution drift: per-source population stability index of the
# n_chars distribution vs the whole corpus
# --------------------------------------------------------------------------

_PSI_BIN = "least(n_chars // 60, 10)"
_PSI_BIN_SPARK = "least(n_chars div 60, 10)"
_N_BINS = 11  # 0..10 after the clamp


@_spec(
    "psi_source_drift",
    f"""
    WITH binned AS (
      SELECT source, {_PSI_BIN} AS bin FROM documents
    ),
    per_source AS (
      SELECT source, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
    ),
    src_tot AS (SELECT source, SUM(c) AS n FROM per_source GROUP BY 1),
    gdist AS (SELECT bin, SUM(c) AS g FROM per_source GROUP BY 1),
    gtot AS (SELECT SUM(c) AS m FROM per_source),
    grid AS (
      SELECT s.source, b.bin, COALESCE(p.c, 0) AS c
      FROM (SELECT DISTINCT source FROM per_source) s
      CROSS JOIN (SELECT DISTINCT bin FROM per_source) b
      LEFT JOIN per_source p ON p.source = s.source AND p.bin = b.bin
    ),
    terms AS (
      SELECT g2.source,
             (CAST(g2.c + 1 AS DOUBLE) / (t.n + {_N_BINS}))
               AS p,
             (CAST(g.g + 1 AS DOUBLE) / (gt.m + {_N_BINS}))
               AS q
      FROM grid g2
      JOIN src_tot t USING (source)
      JOIN gdist g USING (bin)
      CROSS JOIN gtot gt
    )
    SELECT source,
           SUM((p - q) * ln(p / q)) AS psi
    FROM terms GROUP BY 1
    """,
    "extension — population stability index (the standard ML-ops "
    "drift monitor): per-source PSI of the document-length "
    "distribution against the whole corpus, add-one smoothed over a "
    "fixed bin grid so empty bins never divide by zero. Two tiny "
    "aggregations + a bins x sources grid join — the corpus is "
    "scanned ONCE and only (source, bin) counts shuffle. The gate "
    "for 'did this week's crawl change shape before it enters the "
    "training mix'",
)
def psi_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.select("source", F.expr(_PSI_BIN_SPARK).alias("bin"))
    # materialize the tiny (source, bin) contingency table: four
    # downstream aggregates reuse it, and without the checkpoint each
    # would re-scan the corpus through the lineage
    per_source = (
        binned.groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    src_tot = per_source.groupBy("source").agg(F.sum("c").alias("n"))
    glob = per_source.groupBy("bin").agg(F.sum("c").alias("g"))
    glob_tot = per_source.agg(F.sum("c").alias("m"))
    grid = (
        per_source.select("source").distinct()
        .crossJoin(per_source.select("bin").distinct())
        .join(per_source, ["source", "bin"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    terms = (
        grid.join(F.broadcast(src_tot), "source")
        .join(F.broadcast(glob), "bin")
        .crossJoin(F.broadcast(glob_tot))
        .select(
            "source",
            ((F.col("c") + 1).cast("double") / (F.col("n") + _N_BINS)).alias("p"),
            ((F.col("g") + 1).cast("double") / (F.col("m") + _N_BINS)).alias("q"),
        )
    )
    return terms.groupBy("source").agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias(
            "psi"
        )
    )


# --------------------------------------------------------------------------
# Matryoshka-prefix recall: is the 16-dim prefix good enough to serve?
# --------------------------------------------------------------------------

_MRL_QUERIES = (1, 3, 5, 7, 9)
_MRL_PREFIX = 16
_MRL_K = 10


def _mrl_oracle() -> str:
    qs = ", ".join(str(q) for q in _MRL_QUERIES)
    full_q = quantize_sql("q.embedding")
    full_c = quantize_sql("c.embedding")
    pre_q = quantize_sql(f"q.embedding[1:{_MRL_PREFIX}]")
    pre_c = quantize_sql(f"c.embedding[1:{_MRL_PREFIX}]")
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS cid,
             {cosine_sql(full_q, full_c)} AS cos_full,
             {cosine_sql(pre_q, pre_c)} AS cos_prefix
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id IN ({qs})
    ),
    ranked AS (
      SELECT qid, cid,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_full DESC, cid) AS r_full,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos_prefix DESC, cid) AS r_pre
      FROM scored
    )
    SELECT qid,
           CAST(COUNT(CASE WHEN r_full <= {_MRL_K} AND r_pre <= {_MRL_K}
                           THEN 1 END) AS BIGINT) AS n_common,
           CAST({_MRL_K} AS BIGINT) AS k
    FROM ranked GROUP BY 1
    """


@_spec(
    "mrl_prefix_recall",
    _mrl_oracle(),
    "extension — Matryoshka-dimension serving check: per query, how "
    "many of the full-64-dim cosine top-k survive when only the first "
    "16 dims are stored (the MRL truncation question — 4x less "
    "embedding storage if recall holds). Both rankings are exact "
    "Q20-integer cosine, both engines agree bit-for-bit, and the "
    "per-query windows run over candidate COUNTS, not the corpus. "
    "Complements sq_ann_topk (byte-precision) with dim-truncation as "
    "the other compression axis",
)
def mrl_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_MRL_QUERIES)).select(
        F.col("vec_id").alias("qid"),
        quantize("embedding").alias("qv"),
        quantize(f"slice(embedding, 1, {_MRL_PREFIX})").alias("qp"),
    )
    cands = emb.select(
        F.col("vec_id").alias("cid"),
        quantize("embedding").alias("cv"),
        quantize(f"slice(embedding, 1, {_MRL_PREFIX})").alias("cp"),
    )
    from ..operators.similarity import cosine_str

    cos = lambda a, b: F.expr(cosine_str(a, b))
    scored = (
        cands.crossJoin(F.broadcast(queries))
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "cid",
            cos("qv", "cv").alias("cos_full"),
            cos("qp", "cp").alias("cos_prefix"),
        )
    )
    w_full = Window.partitionBy("qid").orderBy(
        F.col("cos_full").desc(), F.col("cid")
    )
    w_pre = Window.partitionBy("qid").orderBy(
        F.col("cos_prefix").desc(), F.col("cid")
    )
    ranked = scored.select(
        "qid",
        F.row_number().over(w_full).alias("r_full"),
        F.row_number().over(w_pre).alias("r_pre"),
    )
    return ranked.groupBy("qid").agg(
        F.sum(
            ((F.col("r_full") <= _MRL_K) & (F.col("r_pre") <= _MRL_K)).cast("int")
        )
        .cast("long")
        .alias("n_common"),
        F.lit(_MRL_K).cast("long").alias("k"),
    )
