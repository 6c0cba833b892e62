"""Wave-5 extension specs: market-basket triangle counting,
token-budget corpus curation, deterministic cross-validation folds, and
a one-pass correlation matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import graph_metrics as _graph
from ..operators.sampling import budget_head, hash_bucket, hash_bucket_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "triangle_count_copurchase",
    _graph.cooccurrence_triangles_sql("lineitem", "l_orderkey", "l_partkey"),
    "extension — market-basket graph motif counting "
    "(operators/graph_metrics.py): parts-bought-together edges with a "
    "clique-blowup cap, then forward-algorithm triangles (each counted "
    "once at its lowest vertex, fan-out Σ outdeg² not Σ deg²); all "
    "equi-joins on node ids, AQE handles hub skew",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = _graph.cooccurrence_edges(li, "l_orderkey", "l_partkey", max_group=8)
    return _graph.triangle_count(edges)


_TOKENS = "size(split(text, ' '))"
_TOKENS_SQL = "len(string_split(text, ' '))"


@_spec(
    "token_budget_curation",
    f"""
    WITH scored AS (
      SELECT source, doc_id, n_chars,
             CAST({_TOKENS_SQL} AS BIGINT) AS n_tokens
      FROM documents
    ), walked AS (
      SELECT source, doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
      FROM scored
    )
    SELECT source,
           CAST(COUNT(CASE WHEN cum_weight <= 2000 THEN 1 END) AS BIGINT)
             AS docs_kept,
           CAST(COALESCE(SUM(CASE WHEN cum_weight <= 2000
                                  THEN n_tokens END), 0) AS BIGINT)
             AS tokens_kept,
           CAST(COUNT(*) AS BIGINT) AS docs_total
    FROM walked GROUP BY source
    """,
    "training-data op — token-budget curation "
    "(operators/sampling.budget_head): per source, keep the best "
    "documents (longest first, id tiebreak) until a 2000-token budget "
    "is spent. One window per source partition, running SUM, no "
    "iteration — each source streams independently at any scale",
)
def token_budget_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(_TOKENS).cast("long").alias("n_tokens"),
    )
    walked = budget_head(
        docs,
        "source",
        [F.col("n_chars").desc(), F.col("doc_id")],
        "n_tokens",
        budget=2000,
    )
    return walked.groupBy("source").agg(
        F.count(F.when(F.col("keep"), 1)).alias("docs_kept"),
        F.coalesce(F.sum(F.when(F.col("keep"), F.col("n_tokens"))), F.lit(0))
        .cast("long")
        .alias("tokens_kept"),
        F.count(F.lit(1)).alias("docs_total"),
    )


@_spec(
    "cv_fold_assignment",
    f"""
    WITH folds AS (
      SELECT lang, {hash_bucket_sql("doc_id", 5)} AS fold FROM documents
    )
    SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM folds GROUP BY fold, lang
    """,
    "extension — deterministic k-fold cross-validation assignment "
    "(reuses sampling.hash_bucket: md5 of the key, engine-portable, "
    "partitioning-independent — the same no-RNG discipline as "
    "train_test_split). Output: per-fold label distribution proving "
    "the folds are balanced",
)
def cv_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", hash_bucket("doc_id", 5).alias("fold"))
        .groupBy("fold", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_pairs():
    return [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]


@_spec(
    "correlation_matrix",
    "SELECT * FROM ("
    + "\nUNION ALL ".join(
        f"SELECT '{a}' AS x, '{b}' AS y, ROUND(corr({a}, {b}), 4) AS r "
        f"FROM lineitem"
        for a, b in _corr_pairs()
    )
    + ")",
    "extension — one-pass Pearson correlation matrix over the fact "
    "table's numeric columns (profiling-layer sibling of "
    "profile_columns): all pairs in a SINGLE Aggregate (partial "
    "moments map-side; one scan however many pairs), then unpivoted "
    "to tidy (x, y, r) rows",
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = _corr_pairs()
    agg = li.agg(
        *[F.round(F.corr(a, b), 4).alias(f"r_{i}") for i, (a, b) in enumerate(pairs)]
    )
    stack = ", ".join(
        f"'{a}', '{b}', r_{i}" for i, (a, b) in enumerate(pairs)
    )
    return agg.select(
        F.expr(f"stack({len(pairs)}, {stack}) AS (x, y, r)")
    )
