"""Wave-15 extension specs: composed IVF-SQ ANN serving index,
exact-recall edit-distance join via deletion neighborhoods, and
histogram-based join-cardinality estimation (the CBO statistic,
verified against the materialized join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import editjoin, similarity
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "ann_ivf_sq_topk",
    similarity.ivf_sq_topk_sql(query_vec_id=1, k=5, n_centroids=8),
    "extension — composed IVF-SQ ANN (operators/similarity.py "
    "ivf_sq_topk): the FAISS IVFx,SQ8 layout — cell pruning "
    "(1/n_centroids of the table) times 1-byte scalar quantization "
    "(4x smaller scans), exact BIGINT ADC inside the probed cell. "
    "Oracle replays the identical assignment+quantize+rank pipeline "
    "in DuckDB list algebra",
)
def ann_ivf_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_sq_topk(emb, query_vec_id=1, k=5, n_centroids=8)


@_spec(
    "edit_distance_neighbors",
    """
    WITH pairs AS (
      SELECT a.c_custkey AS a_id, b.c_custkey AS b_id
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
       AND levenshtein(a.c_name, b.c_name) <= 1
    )
    SELECT a_id AS c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(SUM(b_id) AS BIGINT) AS sum_peer_keys
    FROM pairs GROUP BY 1
    """,
    "extension — exact lev<=1 self-join WITHOUT the cartesian "
    "(operators/editjoin.py, SymSpell/FastSS deletion-neighborhood "
    "blocking): each string explodes to |s|+1 deletion keys in the "
    "scan stage, candidates come from an equi hash join on the key, "
    "and the exact levenshtein verifier runs only on candidates. The "
    "oracle IS the brute-force theta join — equality proves the "
    "deletion-neighborhood candidates have recall exactly 1. "
    "Completes the fuzzy-match family (fuzzy_match_names, "
    "sorted_neighborhood_pairs) with provably-lossless blocking",
)
def edit_distance_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pairs = editjoin.edit_distance_pairs(cust, "c_custkey", "c_name")
    return pairs.groupBy(F.col("a_id").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.sum("b_id").alias("sum_peer_keys"),
    )


@_spec(
    "join_cardinality_estimate",
    """
    WITH joined AS (
      SELECT o.o_orderkey
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    per_key AS (
      SELECT o_orderkey, COUNT(*) AS c FROM joined GROUP BY 1
    )
    SELECT CAST(SUM(c) AS BIGINT) AS join_rows,
           CAST(MAX(c) AS BIGINT) AS max_key_rows,
           CAST(COUNT(*) AS BIGINT) AS n_join_keys
    FROM per_key
    """,
    "extension — join-size estimation from per-key histograms (the "
    "cost-based-optimizer statistic): |A JOIN B| = SUM over keys of "
    "cnt_A*cnt_B, computed from two small pre-aggregations joined on "
    "DISTINCT keys — the fact tables themselves are never joined. The "
    "oracle materializes the real join and counts; equality proves "
    "the histogram shortcut exact. At 100 TB this is how you price a "
    "join (and find its skew cap, max_key_rows) before paying for it",
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    co = orders.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("ca"))
    cl = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    prod = co.join(cl, "o_orderkey").select(
        (F.col("ca") * F.col("cb")).alias("c")
    )
    return prod.agg(
        F.sum("c").alias("join_rows"),
        F.max("c").alias("max_key_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
    )
