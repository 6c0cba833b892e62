"""Wave-4 extension specs: grouped closed-form regression, inverted
index construction, BPE merge statistics, Z-order layout keys, and a
PCA variance contract.

Each continues the pattern of SURVEY §7.2 step 8 — operators the
reference's users reach for when the workload scales past a laptop —
and each is bound to a DuckDB oracle (accuracy-contract style where the
op itself is not SQL-expressible, after plans/extensions.py's
``approx_percentile_accuracy``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import pca as _pca
from ..operators import zorder as _zorder
from ..operators.regression import group_ols, group_ols_oracle_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "group_ols_price_on_quantity",
    group_ols_oracle_sql(
        "lineitem", ["l_returnflag", "l_linestatus"], "l_quantity", "l_extendedprice"
    ),
    "extension — per-group closed-form OLS (grouped analogue of the "
    "reference's single GLM, run_analysis.Rmd:80-99 / SURVEY §2.12 M1); "
    "six sufficient statistics in ONE hash aggregate, map-side combined, "
    "shuffle volume O(groups) not O(rows); identical raw-moment formula "
    "spelled out in the oracle, outputs rounded to 4",
)
def group_ols_price_on_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    fit = group_ols(
        li, ["l_returnflag", "l_linestatus"], "l_quantity", "l_extendedprice"
    )
    return fit.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round("slope", 4).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 4).alias("r2"),
    )


@_spec(
    "inverted_index_postings",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ), clean AS (
      SELECT doc_id, term FROM toks WHERE term <> ''
    ), stats AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM clean GROUP BY term
    ), ranked AS (
      SELECT term, doc_id,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM (SELECT DISTINCT term, doc_id FROM clean) d
    ), posts AS (
      SELECT term,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings_head
      FROM ranked WHERE rn <= 5 GROUP BY term
    )
    SELECT s.term, s.tf, s.df, p.postings_head
    FROM stats s JOIN posts p ON s.term = p.term
    WHERE s.df >= 5
    """,
    "extension — distributed inverted-index build (the construction "
    "step behind bm25_topk_retrieval): per-term document frequency, "
    "total term frequency, and the head of the sorted posting list. "
    "One explode + one shuffle on term; posting heads are bounded "
    "(top-5 by doc_id) so no unbounded list crosses the shuffle",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate to (term, doc_id) first: map-side combine collapses
    # repeated occurrences before the shuffle, and the final per-term
    # state is BOUNDED — only the rank-≤5 doc_ids enter the posting
    # collect (a collect_set of all docs for a stopword-grade term
    # would buffer millions of ids per key at corpus scale). The
    # groupBy("term") reuses the window's term-partitioning, so the
    # whole thing is two exchanges with sort-spillable state between.
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    rn = F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    ranked = per_doc.withColumn("rn", rn)
    stats = ranked.groupBy("term").agg(
        F.sum("cnt").alias("tf"),
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_list(F.when(F.col("rn") <= 5, F.col("doc_id")))
            ),
        ).alias("postings_head"),
    )
    return stats.filter(F.col("df") >= 5).select("term", "tf", "df", "postings_head")


@_spec(
    "bpe_pair_merge_stats",
    """
    WITH words AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ), pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
      FROM words, unnest(generate_series(1, length(w) - 1)) AS t(i)
      WHERE length(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 20
    """,
    "extension — the pair-frequency statistic driving a BPE tokenizer "
    "merge step (the train-side sibling of text.py's token_count_bpe): "
    "top adjacent character pairs across the corpus. Pure expression "
    "explode (transform over sequence), one shuffle on the 2-char pair "
    "key — at 100 TB the pair domain is ≤ alphabet², so the final agg "
    "is tiny however large the corpus; ties broken by pair for a "
    "deterministic cross-engine LIMIT",
)
def bpe_pair_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@_spec(
    "zorder_morton_keys",
    f"""
    SELECT c_custkey, c_nationkey,
           CAST({_zorder.morton_key_sql("c_custkey", "c_nationkey", bits=10)}
                AS BIGINT) AS zkey
    FROM customer
    """,
    "extension — Morton/Z-curve interleave keys for multi-dimensional "
    "file clustering (operators/zorder.py; Delta OPTIMIZE ZORDER "
    "analogue generalizing the reference's single-column county "
    "partitioning, election_results_etl.py:142). Closed-form bit "
    "arithmetic, whole-stage codegen, zero shuffle; the layout rewrite "
    "itself (zorder_by: repartitionByRange + sortWithinPartitions) is "
    "pruning-asserted in tests/test_sources.py",
)
def zorder_morton_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        _zorder.morton_key(F.col("c_custkey"), F.col("c_nationkey"), bits=10).alias(
            "zkey"
        ),
    )


def _max_dim_var_sql(dim: int = 64) -> str:
    terms = ",\n             ".join(
        f"var_pop(CAST(embedding[{i + 1}] AS DOUBLE))" for i in range(dim)
    )
    return f"GREATEST({terms})"


@_spec(
    "pca_variance_contract",
    f"""
    SELECT ROUND({_max_dim_var_sql(64)}, 4) AS max_dim_var,
           TRUE AS pc1_dominates
    FROM embeddings
    """,
    "extension — distributed PCA (operators/pca.py: shuffle-free "
    "mapInPandas Gram partials + driver d×d eigh, the MLlib RowMatrix "
    "split) under an accuracy-contract oracle: the variance captured by "
    "PC1 must dominate the best single axis (Rayleigh-quotient "
    "optimality), with the axis-variance side computed exactly by both "
    "engines. Exact projection parity vs numpy is pinned in "
    "tests/test_ml_multimodal.py",
)
def pca_variance_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps, _vals, mean = _pca.pca_components(emb, "embedding", k=1)
    proj = _pca.project(emb, comps, mean, "embedding", out="pc").select(
        F.element_at("pc", 1).alias("p")
    )
    var_pc1 = proj.agg(F.var_pop("p").alias("v"))
    dim_vars = emb.agg(
        *[
            F.var_pop(F.col("embedding")[i].cast("double")).alias(f"v{i}")
            for i in range(64)
        ]
    ).select(F.greatest(*[F.col(f"v{i}") for i in range(64)]).alias("max_v"))
    return var_pc1.crossJoin(dim_vars).select(
        F.round("max_v", 4).alias("max_dim_var"),
        (F.col("v") >= F.col("max_v") - F.lit(1e-6)).alias("pc1_dominates"),
    )
