"""Product quantization ANN (Jegou et al. 2011, "Product Quantization
for Nearest Neighbor Search") — the codebook-compressed serving path
that completes the ANN family in operators/similarity.py (brute,
sign-LSH, IVF, SQ8, IVF-SQ).

The embedding space is split into ``m`` contiguous subspaces; each
subspace gets its own k-code Lloyd codebook (operators/kmeans.py — Q20
fixed-point, deterministic seed, exact integer distances, so the whole
index is oracle-checkable); a vector is stored as ``m`` small code ids.
Query-time ranking is asymmetric distance computation: the query stays
full-precision, a per-subspace lookup table d(q_sub, centroid) is
built once (m*k entries), and every candidate's approximate distance
is the SUM of m table lookups — never a full-vector distance.

Scale shape: training is m independent bounded k-means runs; encoding
is the same broadcast-argmin narrow expression per subspace (no
shuffle of the corpus); serving reads m SMALL-int codes per vector
(m*log2(k) bits — here 4 codes = 12 bits vs 64 floats = 2 KB), joins
the broadcast LUT, and takes the global top-k via TakeOrdered. At
100 TB this is the memory-bound regime's standard answer: the scan is
~170x smaller than raw vectors and cell-prunable by composing with
ivf_topk exactly like IVF-SQ.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import _dist_sql, _dist_str, assign_to_centroids, _lloyd, kmeans_assign_ctes
from .similarity import quantize


def pq_topk(
    emb: DataFrame,
    m: int = 4,
    sub_dim: int = 16,
    k_codes: int = 8,
    iters: int = 2,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` nearest neighbors of ``query_vec_id`` by PQ-ADC
    approximate squared-L2. Output: ``(vec_id, label, adist)``
    ascending, ties by vec_id; the query row itself is excluded
    (mirroring sq_topk)."""
    codes_parts: list[DataFrame] = []
    lut_parts: list[DataFrame] = []
    for s in range(m):
        sub = emb.select(
            "vec_id",
            F.slice("embedding", s * sub_dim + 1, sub_dim).alias("semb"),
        )
        pts = sub.select(
            F.col("vec_id").alias("vid"), quantize("semb").alias("v")
        )
        cents = _lloyd(pts, k_codes, iters)
        codes_parts.append(
            assign_to_centroids(pts, cents).select(
                "vid", F.lit(s).alias("s"), "cid"
            )
        )
        q = pts.filter(F.col("vid") == query_vec_id).select(
            F.col("v").alias("qv")
        )
        lut_parts.append(
            cents.crossJoin(F.broadcast(q)).select(
                F.lit(s).alias("s"),
                "cid",
                F.expr(_dist_str("qv", "cv")).alias("d"),
            )
        )
    codes = reduce(DataFrame.unionByName, codes_parts)
    luts = reduce(DataFrame.unionByName, lut_parts)
    adist = (
        codes.filter(F.col("vid") != query_vec_id)
        .join(F.broadcast(luts), ["s", "cid"])
        .groupBy("vid")
        .agg(F.sum("d").cast("long").alias("adist"))
    )
    return (
        adist.join(
            emb.select(F.col("vec_id").alias("vid"), "label"), "vid"
        )
        .select(F.col("vid").alias("vec_id"), "label", "adist")
        .orderBy(F.col("adist").asc(), F.col("vec_id"))
        .limit(k)
    )


def pq_topk_sql(
    m: int = 4,
    sub_dim: int = 16,
    k_codes: int = 8,
    iters: int = 2,
    query_vec_id: int = 0,
    k: int = 10,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`pq_topk`: one prefixed Lloyd-unroll CTE
    group per subspace sharing a single WITH clause."""
    groups: list[str] = []
    code_sels: list[str] = []
    lut_sels: list[str] = []
    for s in range(m):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        with_clause, final_assign = kmeans_assign_ctes(
            k=k_codes,
            iters=iters,
            id_col="vec_id",
            vec_col=f"embedding[{lo}:{hi}]",
            table=table,
            prefix=f"s{s}_",
        )
        groups.append(with_clause.removeprefix("WITH "))
        code_sels.append(
            f"SELECT vid, {s} AS s, cid FROM ({final_assign})"
        )
        lut_sels.append(
            f"SELECT {s} AS s, c.cid, {_dist_sql('q.v', 'c.cv')} AS d\n"
            f"      FROM s{s}_c{iters} c CROSS JOIN "
            f"(SELECT v FROM s{s}_pts WHERE vid = {query_vec_id}) q"
        )
    codes = "\n      UNION ALL ".join(code_sels)
    luts = "\n      UNION ALL ".join(lut_sels)
    return f"""
    WITH {",".join(groups)},
    codes AS ({codes}),
    luts AS ({luts}),
    adist AS (
      SELECT vid, CAST(SUM(d) AS BIGINT) AS adist
      FROM codes JOIN luts USING (s, cid)
      WHERE vid <> {query_vec_id}
      GROUP BY vid
    )
    SELECT e.vec_id, e.label, a.adist
    FROM adist a JOIN {table} e ON e.vec_id = a.vid
    ORDER BY a.adist ASC, e.vec_id
    LIMIT {k}
    """
