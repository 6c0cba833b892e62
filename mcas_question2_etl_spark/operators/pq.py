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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import _dist_sql, _dist_str, kmeans_assign_ctes
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
    (mirroring sq_topk).

    Execution shape (optimization round r8): the ``m`` per-subspace
    Lloyd runs are independent, identically-seeded problems, so they
    train as ONE grouped Lloyd over an exploded ``(s, vid, v)`` table —
    the same floor(sum/count) update and (dist, cid) argmin per
    subspace group, hence bit-identical codebooks — instead of ``m``
    sequential driver-blocking loops. This collapses m*iters
    checkpoint jobs and ~60 stages into iters jobs and ~15 stages;
    the spec was driver-bound (57 stages totalling ~3 s of executor
    CPU for ~20 s of wall)."""
    pts = emb.select(
        F.col("vec_id").alias("vid"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        quantize(
                            f"slice(embedding, {s * sub_dim + 1}, {sub_dim})"
                        ).alias("v"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("__sv"),
    ).select("vid", F.col("__sv.s").alias("s"), F.col("__sv.v").alias("v"))
    # grouped Lloyd: identical per-subspace arithmetic, one job per
    # iteration for all m subspaces
    cents = pts.filter(F.col("vid") < k_codes).select(
        "s", F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    amin = F.expr(
        "array_min(transform(cents, c -> "
        f"struct({_dist_str('v', 'c.cv')} AS dist, c.cid AS cid)))"
    )
    for _ in range(iters):
        carr = F.broadcast(
            cents.groupBy("s").agg(
                F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias(
                    "cents"
                )
            )
        )
        assigned = pts.join(carr, "s").select(
            "s", "vid", "v", amin["cid"].alias("cid")
        )
        dims = assigned.select(
            "s", "cid", F.posexplode("v").alias("d0", "x")
        ).select("s", "cid", (F.col("d0") + 1).alias("d"), "x")
        per_dim = dims.groupBy("s", "cid", "d").agg(
            F.floor(F.sum("x").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("val")
        )
        # eager k*m-row checkpoint per iteration — the _lloyd
        # discipline (lineage blowup + lazy-materialization races)
        cents = per_dim.groupBy("s", "cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, val))),"
                " p -> p.val)"
            ).alias("cv")
        ).localCheckpoint(eager=True)
    carr = F.broadcast(
        cents.groupBy("s").agg(
            F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents")
        )
    )
    codes = pts.join(carr, "s").select(
        "vid", "s", amin["cid"].alias("cid")
    )
    q = pts.filter(F.col("vid") == query_vec_id).select(
        "s", F.col("v").alias("qv")
    )
    luts = cents.join(F.broadcast(q), "s").select(
        "s", "cid", F.expr(_dist_str("qv", "cv")).alias("d")
    )
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
