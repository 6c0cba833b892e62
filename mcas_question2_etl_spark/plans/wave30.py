"""Wave-30 extension spec: label-centroid separation — the embedding
quality diagnostic (are the classes separable in this space?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import quantize, quantize_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_DIM = 64


@_spec(
    "label_centroid_separation",
    f"""
    WITH q AS (
      SELECT label, {quantize_sql('embedding')} AS qv FROM embeddings
    ),
    dims AS (
      SELECT label, t.i, SUM(qv[t.i]) AS s, COUNT(*) AS n
      FROM q, unnest(range(1, {_DIM + 1})) AS t(i)
      GROUP BY label, t.i
    ),
    cent AS (
      SELECT label, MAX(n) AS n,
             list(CAST(s AS DOUBLE) / n ORDER BY i) AS c
      FROM dims GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           sqrt(list_sum([(x[1] - x[2]) * (x[1] - x[2])
                          for x in list_zip(a.c, b.c)])) AS centroid_dist
    FROM cent a JOIN cent b ON a.label < b.label
    """,
    "extension — label-centroid separation matrix: per-class centroids "
    "of the embedding space (exact per-dimension BIGINT sums over the "
    "Q20 grid, divided once) and the pairwise centroid distances — "
    "the first diagnostic of whether labels are separable in an "
    "embedding space before training a probe on it. One aggregation "
    "over the vectors (centroids are labels-sized and broadcastable); "
    "the pair join runs over k rows. Exact integer sums make the "
    "centroids bit-identical across engines and partitionings",
)
def label_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("label", quantize("embedding").alias("qv"))
    # per-dim BIGINT sums in ONE aggregate: fold the collected batch
    # per dimension via aggregate() over the vector index
    dim_sums = [
        F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(_DIM)
    ]
    sums = q.groupBy("label").agg(F.count(F.lit(1)).alias("n"), *dim_sums)
    cent = sums.select(
        "label",
        "n",
        F.array(
            *[
                (F.col(f"s{i}").cast("double") / F.col("n"))
                for i in range(_DIM)
            ]
        ).alias("c"),
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("n").alias("n_a"), F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("n").alias("n_b"), F.col("c").alias("cb")
    )
    dist = F.sqrt(
        F.expr(
            "aggregate(zip_with(ca, cb, (x, y) -> (x - y) * (x - y)), "
            "cast(0.0 as double), (acc, v) -> acc + v)"
        )
    )
    return (
        a.crossJoin(b)
        .filter(F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", "n_a", "n_b", dist.alias("centroid_dist"))
    )
