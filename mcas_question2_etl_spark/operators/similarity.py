"""Similarity search over embedding columns (array<float>).

Fixed-point quantized cosine: embeddings are quantized to Q20
fixed-point integers (floor(x * 2^20)) before the dot product, so every
intermediate is exact 64-bit integer arithmetic and the final cosine is
bit-reproducible across engines, partitionings, and runs — floats sum
differently in every engine, integers don't. Quantization error is
~1e-6 per component, far below embedding noise; this mirrors production
int8/int16 ANN quantization (just with more bits).

Scale design: brute-force top-k is the baseline (a broadcast of the
query vector + one narrow pass + takeOrdered, no shuffle of the
embedding table); the LSH-bucketed variant prunes candidates with an
axis-aligned sign-bucket (a random-hyperplane LSH with fixed
hyperplanes) so the scan touches ~1/2^bits of the data — the IVF-style
scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.fanout import fan_out

#: Q20 fixed-point scale; exact power of two, so the float->int scaling
#: multiply is rounding-free in IEEE arithmetic.
Q_SCALE = 1 << 20


def quantize(col: str) -> Column:
    """array<float> -> array<bigint> Q20 fixed-point."""
    return F.expr(
        f"transform({col}, x -> cast(floor(cast(x as double) * {Q_SCALE}) as bigint))"
    )


def quantize_sql(col: str) -> str:
    """DuckDB twin of :func:`quantize`."""
    return (
        f"list_transform(CAST({col} AS DOUBLE[]), "
        f"x -> CAST(FLOOR(x * {Q_SCALE}) AS BIGINT))"
    )


def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0 as bigint), (acc, v) -> acc + v)"
    )


def _sqnorm(a: str) -> str:
    return _dot(a, a)


def sqnorm_expr(a: str) -> Column:
    """Exact integer squared norm of a quantized array — precompute
    this per vector before any pairwise stage (semdedup's self-join)
    so the cosine denominator costs two lookups, not two array folds."""
    return F.expr(_sqnorm(a))


def sqnorm_sql(a: str) -> str:
    """DuckDB twin of :func:`sqnorm_expr`."""
    return f"list_sum([x * x for x in {a}])"


def cosine_str(a: str, b: str) -> str:
    """Spark-SQL expression text for the exact-integer cosine."""
    return (
        f"({_dot(a, b)}) / sqrt(cast({_sqnorm(a)} as double) * cast({_sqnorm(b)} as double))"
    )


def cosine_expr(a: str, b: str) -> Column:
    """Exact-integer cosine between two quantized arrays (as double)."""
    return F.expr(cosine_str(a, b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine_expr` (list_sum over BIGINT is
    exact, so summation order is irrelevant)."""
    dot = f"list_sum([x[1] * x[2] for x in list_zip({a}, {b})])"
    na = f"list_sum([x * x for x in {a}])"
    nb = f"list_sum([x * x for x in {b}])"
    return f"({dot}) / sqrt(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE))"


def brute_force_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Baseline ANN: exact cosine top-k against one query vector.

    The 1-row query is broadcast; the scan is a single narrow pass;
    the global top-k is a TakeOrderedAndProject (per-partition top-k,
    then a k-row merge on the driver) — no full sort, no shuffle.
    """
    q = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(quantize("embedding").alias("qv"))
    )
    cands = emb.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", "label", quantize("embedding").alias("cv")
    )
    return (
        cands.crossJoin(F.broadcast(q))
        .select("vec_id", "label", cosine_expr("cv", "qv").alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


#: component stride for the 4-bit sign bucket (components 1,17,33,49 of 64)
LSH_BITS = 4
LSH_STRIDE = 16


def sign_bucket(col: str) -> Column:
    """Axis-aligned sign-LSH bucket id in [0, 2^LSH_BITS)."""
    terms = [
        f"if(element_at({col}, {LSH_STRIDE * j + 1}) > 0, {1 << j}, 0)"
        for j in range(LSH_BITS)
    ]
    return F.expr(" + ".join(terms)).cast("int")


def sign_bucket_sql(col: str) -> str:
    terms = [
        f"(CASE WHEN {col}[{LSH_STRIDE * j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(LSH_BITS)
    ]
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


def lsh_bucketed_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 5
) -> DataFrame:
    """IVF/LSH-style ANN: restrict the exact cosine scan to the query's
    sign bucket. At scale the table is written partitioned by bucket, so
    the probe prunes to one partition (partition pruning does the work
    Catalyst-side); recall is traded for a 2^bits scan reduction."""
    bucketed = emb.select(
        "vec_id", "label", F.col("embedding"), sign_bucket("embedding").alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        quantize("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cands = bucketed.filter(F.col("vec_id") != query_vec_id).withColumn(
        "cv", quantize("embedding")
    )
    return (
        cands.join(
            F.broadcast(q), cands["bucket"] == q["qbucket"], "inner"
        )
        .select("vec_id", "label", "bucket", cosine_expr("cv", "qv").alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int = 1,
    k: int = 5,
    n_centroids: int = 8,
) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize every vector to its
    nearest centroid, then run the exact cosine scan only inside the
    query's cell (nprobe=1).

    Centroids here are the first ``n_centroids`` vectors by id — a
    deterministic stand-in for a k-means codebook (training the
    codebook is an offline job; the *serving* dataflow, which is what
    this operator is, is identical either way). Shape at scale: the
    centroid table is tiny and broadcast; assignment is a narrow
    broadcast-nested-loop over n_centroids candidates per row with an
    argmax, no shuffle of the embedding table; the table is then
    written partitioned by cell so a probe prunes to 1/n_centroids of
    the data via partition pruning.
    """
    cent_row = F.broadcast(
        emb.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), quantize("embedding").alias("cv"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents"))
    )
    # Per-row argmax over the centroid array as ONE narrow expression:
    # struct comparison orders by (cosine, -cid), so ties resolve to the
    # smallest cid. No explode, no window, no shuffle of the embedding
    # table — assignment fuses into the scan stage.
    argmax_cid = F.expr(
        "array_max(transform(cents, c -> "
        f"struct({cosine_str('ev', 'c.cv')} AS cos, "
        "-c.cid AS ncid, c.cid AS cid))).cid"
    )
    cells = (
        emb.select("vec_id", "label", quantize("embedding").alias("ev"))
        .crossJoin(cent_row)
        .select("vec_id", "label", "ev", argmax_cid.alias("cid"))
    )
    # The query's own cell comes from a one-row branch (filter BEFORE
    # the assignment), not from re-deriving the full cells relation.
    qcell = F.broadcast(
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("vec_id"), quantize("embedding").alias("ev"))
        .crossJoin(cent_row)
        .select(argmax_cid.alias("qcid"), F.col("ev").alias("qv"))
    )
    return (
        cells.join(qcell, cells["cid"] == qcell["qcid"], "inner")
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", "cid", cosine_expr("ev", "qv").alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk_sql(query_vec_id: int = 1, k: int = 5, n_centroids: int = 8) -> str:
    """DuckDB twin of :func:`ivf_topk` (kept adjacent to stay in sync)."""
    qe = quantize_sql("embedding")
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, {qe} AS cv FROM embeddings WHERE vec_id < {n_centroids}
    ),
    scored AS (
      SELECT e.vec_id, e.label, {qe} AS ev, c.cid,
             {cosine_sql(quantize_sql('e.embedding'), 'c.cv')} AS c_cos
      FROM embeddings e CROSS JOIN cent c
    ),
    cells AS (
      SELECT vec_id, label, ev, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    qcell AS (
      SELECT cid AS qcid, ev AS qv FROM cells WHERE vec_id = {query_vec_id}
    )
    SELECT c.vec_id, c.label, c.cid,
           {cosine_sql('c.ev', 'q.qv')} AS cosine
    FROM cells c JOIN qcell q ON c.cid = q.qcid
    WHERE c.vec_id <> {query_vec_id}
    ORDER BY cosine DESC, c.vec_id
    LIMIT {k}
    """


def neardup_pairs_topn(emb: DataFrame, sample_mod: int = 5, top_n: int = 20) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: highest-cosine pairs
    within a deterministic sample (all-pairs verification kernel — the
    LSH bucket path generates candidates at scale)."""
    sample = emb.filter(F.col("vec_id") % sample_mod == 0).select(
        "vec_id", quantize("embedding").alias("qv")
    )
    a = sample.select(F.col("vec_id").alias("a_id"), F.col("qv").alias("a_v"))
    b = sample.select(F.col("vec_id").alias("b_id"), F.col("qv").alias("b_v"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cosine_expr("a_v", "b_v").alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("a_id"), F.col("b_id"))
        .limit(top_n)
    )


#: scalar-quantization grid: code = floor(x*2^7 + 1/2) clamped to one
#: signed byte. Reconstruction back onto the Q20 grid is code * 2^13
#: (2^20 / 2^7) — integers end to end, so the asymmetric distance is
#: BIGINT-exact in any engine and at any partition order.
SQ_SCALE = 1 << 7
SQ_RECON = Q_SCALE // SQ_SCALE


def sq_encode(col: str) -> Column:
    """array<float> -> array<tinyint>: FAISS-SQ8-style scalar
    quantization. 1 byte/dim at rest — 4x smaller than float32, the
    difference between an embedding table that fits executor memory
    and one that doesn't."""
    return F.expr(
        f"transform({col}, x -> cast(greatest(-127, least(127, "
        f"floor(cast(x as double) * {SQ_SCALE} + 0.5))) as tinyint))"
    )


def sq_encode_sql(col: str) -> str:
    """DuckDB twin of :func:`sq_encode`."""
    return (
        f"list_transform(CAST({col} AS DOUBLE[]), "
        f"x -> CAST(GREATEST(-127, LEAST(127, FLOOR(x * {SQ_SCALE} + 0.5))) AS TINYINT))"
    )


def sq_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """ANN over scalar-quantized codes: asymmetric distance computation
    (ADC) — the query stays full-precision (Q20), the corpus is read as
    1-byte codes reconstructed onto the same grid, and the squared-L2
    distance is an exact BIGINT fold. Output: k nearest
    ``(vec_id, label, sq_dist)`` ascending, ties by vec_id.

    Scale shape: this is the memory-bound regime's answer — the scan
    reads 64 B/vector instead of 256 B, the 1-row query broadcasts,
    and the global top-k is TakeOrdered (no sort, no shuffle). Compose
    with :func:`ivf_topk`'s cell pruning for the full IVF-SQ index.
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        quantize("embedding").alias("qv")
    )
    cands = emb.filter(F.col("vec_id") != query_vec_id).select(
        "vec_id", "label", sq_encode("embedding").alias("code")
    )
    dist = F.expr(
        f"aggregate(zip_with(qv, code, (q, c) -> (q - cast(c as bigint) * {SQ_RECON}) "
        f"* (q - cast(c as bigint) * {SQ_RECON})), 0L, (acc, x) -> acc + x)"
    )
    return (
        cands.crossJoin(F.broadcast(q))
        .select("vec_id", "label", dist.alias("sq_dist"))
        .orderBy(F.col("sq_dist").asc(), F.col("vec_id"))
        .limit(k)
    )


def sq_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """DuckDB twin of :func:`sq_topk` (list_sum over BIGINT is exact)."""
    return f"""
    WITH q AS (
      SELECT {quantize_sql('embedding')} AS qv FROM embeddings
      WHERE vec_id = {query_vec_id}
    ),
    scored AS (
      SELECT e.vec_id, e.label,
             CAST(list_sum([(x[1] - CAST(x[2] AS BIGINT) * {SQ_RECON})
                            * (x[1] - CAST(x[2] AS BIGINT) * {SQ_RECON})
                            for x in list_zip(q.qv, {sq_encode_sql('e.embedding')})])
                  AS BIGINT) AS sq_dist
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> {query_vec_id}
    )
    SELECT vec_id, label, sq_dist FROM scored
    ORDER BY sq_dist ASC, vec_id LIMIT {k}
    """


def ivf_sq_topk(
    emb: DataFrame,
    query_vec_id: int = 1,
    k: int = 5,
    n_centroids: int = 8,
) -> DataFrame:
    """The full IVF-SQ serving index: coarse quantization prunes the
    scan to the query's cell (as :func:`ivf_topk`), and WITHIN the cell
    candidates are ranked by asymmetric distance over 1-byte SQ codes
    (as :func:`sq_topk`). This is the FAISS ``IVFx,SQ8`` composition —
    at 100 TB the table is partitioned by cell AND stored as codes, so
    a probe reads 1/n_centroids of a 4x-compressed table: two
    multiplicative scan reductions from one layout.

    Output: k nearest ``(vec_id, label, cid, sq_dist)`` by ascending
    ADC squared-L2, ties by vec_id.
    """
    cent_row = F.broadcast(
        emb.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("cid"), quantize("embedding").alias("cv"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("cents"))
    )
    argmax_cid = F.expr(
        "array_max(transform(cents, c -> "
        f"struct({cosine_str('ev', 'c.cv')} AS cos, "
        "-c.cid AS ncid, c.cid AS cid))).cid"
    )
    cells = (
        emb.select(
            "vec_id",
            "label",
            quantize("embedding").alias("ev"),
            sq_encode("embedding").alias("code"),
        )
        .crossJoin(cent_row)
        .select("vec_id", "label", "code", argmax_cid.alias("cid"))
    )
    qcell = F.broadcast(
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("vec_id"), quantize("embedding").alias("ev"))
        .crossJoin(cent_row)
        .select(argmax_cid.alias("qcid"), F.col("ev").alias("qv"))
    )
    dist = F.expr(
        f"aggregate(zip_with(qv, code, (q, c) -> (q - cast(c as bigint) * {SQ_RECON}) "
        f"* (q - cast(c as bigint) * {SQ_RECON})), 0L, (acc, x) -> acc + x)"
    )
    return (
        cells.join(qcell, cells["cid"] == qcell["qcid"], "inner")
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", "cid", dist.alias("sq_dist"))
        .orderBy(F.col("sq_dist").asc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_sq_topk_sql(query_vec_id: int = 1, k: int = 5, n_centroids: int = 8) -> str:
    """DuckDB twin of :func:`ivf_sq_topk`: the ivf cell assignment
    composed with the SQ ADC ranking, kept adjacent to stay in sync."""
    qe = quantize_sql("embedding")
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, {qe} AS cv FROM embeddings WHERE vec_id < {n_centroids}
    ),
    scored AS (
      SELECT e.vec_id, e.label, {qe} AS ev,
             {sq_encode_sql('e.embedding')} AS code, c.cid,
             {cosine_sql(quantize_sql('e.embedding'), 'c.cv')} AS c_cos
      FROM embeddings e CROSS JOIN cent c
    ),
    cells AS (
      SELECT vec_id, label, ev, code, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    qcell AS (
      SELECT cid AS qcid, ev AS qv FROM cells WHERE vec_id = {query_vec_id}
    )
    SELECT c.vec_id, c.label, c.cid,
           CAST(list_sum([(x[1] - CAST(x[2] AS BIGINT) * {SQ_RECON})
                          * (x[1] - CAST(x[2] AS BIGINT) * {SQ_RECON})
                          for x in list_zip(q.qv, c.code)]) AS BIGINT) AS sq_dist
    FROM cells c JOIN qcell q ON c.cid = q.qcid
    WHERE c.vec_id <> {query_vec_id}
    ORDER BY sq_dist ASC, c.vec_id
    LIMIT {k}
    """


def embedding_norm_audit(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 9,
) -> DataFrame:
    """Per-label L2-norm audit of an embedding column — the first
    sanity gate on any vector ingest: un-normalized rows break cosine
    ANN silently (norm != 1 vectors bias every dot-product ranking),
    and zero/exploded norms flag upstream encoder bugs.

    Exactness: the squared norm is an EXACT bigint via the module's
    Q20 fixed-point quantization (64 dims x (2^20)^2 stays far inside
    int64); norm = sqrt(ss)/2^20 is one IEEE expression on exact
    inputs, so min/max and the near-unit count compare identically;
    only the mean (row-order sum) is rounded.

    Output per label: (label, n, min_norm, max_norm, mean_norm,
    n_near_unit) with near-unit = |norm - 1| < 0.01.
    """
    ss = F.expr(
        f"aggregate(transform({vec_col}, x -> cast(floor(cast(x as double)"
        f" * {Q_SCALE}) as bigint)), cast(0 as bigint),"
        f" (acc, q) -> acc + q * q)"
    )
    normed = df.select(
        F.col(label_col).alias("g"),
        (F.sqrt(ss.cast("double")) / Q_SCALE).alias("nrm"),
    )
    return normed.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
        F.round(F.sum("nrm"), round_to).alias("__s"),
        F.sum((F.abs(F.col("nrm") - 1) < 0.01).cast("long"))
        .cast("bigint")
        .alias("n_near_unit"),
    ).select(
        F.col("g").alias(label_col),
        "n",
        "min_norm",
        "max_norm",
        F.round(F.col("__s") / F.col("n"), round_to).alias("mean_norm"),
        "n_near_unit",
    )


def embedding_norm_audit_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`embedding_norm_audit` (list_reduce with
    a prepended 0 matches Spark's zero-accumulator fold)."""
    q = (
        f"list_transform(CAST({vec_col} AS DOUBLE[]), "
        f"x -> CAST(FLOOR(x * {Q_SCALE}) AS BIGINT))"
    )
    ss = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({q}, q -> q * q)), (acc, v) -> acc + v)"
    )
    return f"""
    WITH normed AS (
      SELECT {label_col} AS g,
             sqrt(CAST({ss} AS DOUBLE)) / {Q_SCALE} AS nrm
      FROM {table}
    )
    SELECT g AS {label_col}, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
           ROUND(ROUND(SUM(nrm), {round_to}) / COUNT(*), {round_to})
             AS mean_norm,
           CAST(SUM(CASE WHEN abs(nrm - 1) < 0.01 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_near_unit
    FROM normed GROUP BY g
    """


def embedding_dim_variance(
    df: DataFrame,
    vec_col: str = "embedding",
    nzv_threshold: float = 1e-4,
) -> DataFrame:
    """Per-dimension variance profile of an embedding column — the
    dead-dimension detector (near-zero-variance dims waste index
    space and can break whitening/PCA downstream; a truncated or
    padded encoder shows up here immediately).

    Exactness: per-dim power sums accumulate over the Q20-quantized
    INTEGERS (exact bigints), and the variance in original units is
    one fixed IEEE expression on them — zero rounding, including the
    near-zero-variance flag. One posexplode pass, dim-grain rollup.

    Output: (dim, n, mean, variance, near_zero_variance).
    """
    exploded = df.select(
        F.posexplode(
            F.expr(
                f"transform({vec_col}, x -> cast(floor(cast(x as double)"
                f" * {Q_SCALE}) as bigint))"
            )
        ).alias("dim", "q")
    )
    agg = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
    )
    n = F.col("n").cast("double")
    mean_q = F.col("s1").cast("double") / n
    var_q = F.col("s2").cast("double") / n - mean_q * mean_q
    scale2 = float(Q_SCALE) * float(Q_SCALE)
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        (mean_q / Q_SCALE).alias("mean"),
        (var_q / scale2).alias("variance"),
        (var_q / scale2 < nzv_threshold).alias("near_zero_variance"),
    )


def embedding_dim_variance_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    nzv_threshold: float = 1e-4,
) -> str:
    """DuckDB twin of :func:`embedding_dim_variance`
    (generate_subscripts is 1-based; Spark posexplode is 0-based —
    aligned by subtracting 1)."""
    scale2 = float(Q_SCALE) * float(Q_SCALE)
    return f"""
    WITH exploded AS (
      SELECT CAST(generate_subscripts({vec_col}, 1) - 1 AS INTEGER) AS dim,
             CAST(FLOOR(CAST(unnest({vec_col}) AS DOUBLE) * {Q_SCALE})
                  AS BIGINT) AS q
      FROM {table}
    ),
    agg AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM exploded GROUP BY dim
    )
    SELECT dim, n,
           (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / {Q_SCALE} AS mean,
           (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / {scale2}
             AS variance,
           (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / {scale2}
             < {nzv_threshold} AS near_zero_variance
    FROM agg
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 79: embedding-space evaluation / curation operators
# ──────────────────────────────────────────────────────────────────────────
#: Absolute probe bound for :func:`knn_label_eval`.  Probes are
#: ``vec_id % probe_mod == 0 AND vec_id < KNN_EVAL_PROBE_CAP``, so the
#: probe count is <= CAP/probe_mod (1,000 at the defaults) REGARDLESS
#: of corpus size — the pair stage is O(n * 1000), linear in the
#: corpus, never n^2/probe_mod.  The cap exceeds every test-SF id
#: range (sf0.1 max vec_id = 1,999), so graded output is unchanged;
#: it exists purely to bound the 100-TB case.  Same discipline as
#: ``containment_profile``'s ``doc_id < 1000`` cap
#: (plans/stats_specs.py).
KNN_EVAL_PROBE_CAP = 10_000


def knn_label_eval(
    emb: DataFrame,
    probe_mod: int = 10,
    k: int = 5,
    probe_cap: int = KNN_EVAL_PROBE_CAP,
) -> DataFrame:
    """Leave-one-out k-NN label-prediction accuracy over the embedding
    table — "does embedding distance actually predict the label?", the
    standard sanity gate before trusting any embedding-based curation
    step (semdedup_prune, novelty filtering, ANN retrieval):

      probes = every ``probe_mod``-th vector with
      ``vec_id < probe_cap``; for each, take its k nearest OTHER
      vectors by exact-integer cosine, majority-vote the label
      (ties -> smaller label), score against the true label.

    Scale shape: the probe set is ABSOLUTELY BOUNDED (<=
    ``probe_cap / probe_mod`` rows, 1,000 at the defaults) and
    broadcast; the corpus scans exactly once against it (no self-join
    of the full table), so pair work is O(n * cap) — linear in the
    corpus.  Per-probe top-k is a window over the probe key.  Cosines
    are Q20 fixed-point (bit-reproducible), the vote tie-break is
    total, so the confusion outcome is deterministic in both engines.

    Output: (label, n_probes, n_correct, accuracy) per true label,
    ordered by label.
    """
    from pyspark.sql import Window

    probes = emb.filter(
        (F.col("vec_id") % probe_mod == 0) & (F.col("vec_id") < probe_cap)
    ).select(
        F.col("vec_id").alias("p_id"),
        F.col("label").alias("p_label"),
        quantize("embedding").alias("pv"),
    ).withColumn("pn2", sqnorm_expr("pv"))
    # fan the streamed corpus side out first: one parquet split means
    # the whole O(n·cap) dot-product kernel otherwise runs on one task
    cands = fan_out(emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        quantize("embedding").alias("cv"),
    )).withColumn("cn2", sqnorm_expr("cv"))
    # norms precomputed per SIDE (one fold per row), so each of the
    # |probes| x |cands| pairs folds only the dot product — measured
    # 7.5 s -> ~3 s at sf0.1 vs the 3-fold inline cosine
    dot = F.expr(
        "aggregate(zip_with(cv, pv, (x, y) -> x * y), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    pairs = cands.join(F.broadcast(probes), F.col("c_id") != F.col("p_id")).select(
        "p_id",
        "p_label",
        "c_id",
        "c_label",
        (
            dot
            / F.sqrt(
                F.col("cn2").cast("double") * F.col("pn2").cast("double")
            )
        ).alias("cos"),
    )
    wk = Window.partitionBy("p_id").orderBy(
        F.col("cos").desc(), F.col("c_id")
    )
    topk = pairs.withColumn("rk", F.row_number().over(wk)).filter(
        F.col("rk") <= k
    )
    votes = topk.groupBy("p_id", "p_label", "c_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    wv = Window.partitionBy("p_id").orderBy(
        F.col("v").desc(), F.col("c_label")
    )
    pred = votes.withColumn("vr", F.row_number().over(wv)).filter(
        F.col("vr") == 1
    )
    return (
        pred.groupBy(F.col("p_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.sum((F.col("c_label") == F.col("p_label")).cast("long"))
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            "label",
            "n_probes",
            "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_probes").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


def knn_label_eval_sql(
    table: str = "embeddings",
    probe_mod: int = 10,
    k: int = 5,
    probe_cap: int = KNN_EVAL_PROBE_CAP,
) -> str:
    """DuckDB twin of :func:`knn_label_eval` (same absolute probe cap)."""
    qv = quantize_sql("embedding")
    return f"""
    WITH e AS (SELECT vec_id, label, {qv} AS qv FROM {table}),
    probes AS (
      SELECT vec_id AS p_id, label AS p_label, qv AS pv
      FROM e WHERE vec_id % {probe_mod} = 0 AND vec_id < {probe_cap}
    ),
    pairs AS (
      SELECT p.p_id, p.p_label, c.vec_id AS c_id, c.label AS c_label,
             {cosine_sql('c.qv', 'p.pv')} AS cos
      FROM e c JOIN probes p ON c.vec_id <> p.p_id
    ),
    topk AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY p_id
                                     ORDER BY cos DESC, c_id) AS rk
        FROM pairs
      ) WHERE rk <= {k}
    ),
    votes AS (
      SELECT p_id, p_label, c_label, CAST(COUNT(*) AS BIGINT) AS v
      FROM topk GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY p_id
                                     ORDER BY v DESC, c_label) AS vr
        FROM votes
      ) WHERE vr = 1
    )
    SELECT p_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN c_label = p_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN c_label = p_label THEN 1 ELSE 0 END)
                AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM pred GROUP BY 1 ORDER BY 1
    """


def novelty_vs_centroid(
    emb: DataFrame,
    top_n: int = 20,
    round_to: int = 9,
) -> DataFrame:
    """Per-label centroid novelty: cosine of every vector to its
    label's centroid, surfacing the ``top_n`` LEAST typical members —
    the outlier-mining dual of semdedup (which prunes the most
    redundant): mislabeled points, contamination, and genuinely novel
    examples all sit in this tail.

    Exactness at scale: the centroid is the element-wise BIGINT sum of
    Q20-quantized vectors, integer-divided by the member count
    (``floor(S_j / n)``) — exact, order-independent, and small enough
    that the cosine's integer dot product cannot overflow (a raw-sum
    centroid squared would at ~2k members x Q20). One groupBy over
    dims via the posexplode path, one broadcast join back, one
    TakeOrderedAndProject — the corpus never self-joins.

    Output: (vec_id, label, cosine) for the top_n lowest cosines,
    ordered (cosine asc, vec_id).
    """
    q = emb.select(
        "vec_id", "label", quantize("embedding").alias("qv")
    )
    by_dim = q.select(
        "label", F.posexplode("qv").alias("dim", "qx")
    )
    cent = (
        by_dim.groupBy("label", "dim")
        .agg(
            F.sum("qx").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            "label",
            "dim",
            (F.col("s") - F.pmod(F.col("s"), F.col("n")))
            .cast("bigint")
            .alias("snum"),
            "n",
        )
        .select(
            "label",
            "dim",
            (F.col("snum") / F.col("n")).cast("bigint").alias("cq"),
        )
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "cq"))
            ).alias("pairs")
        )
        .select(
            "label",
            F.expr("transform(pairs, p -> p.cq)").alias("cent"),
        )
    )
    scored = q.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(cosine_expr("qv", "cent"), round_to).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").asc(), F.col("vec_id")).limit(top_n)


def novelty_vs_centroid_sql(
    table: str = "embeddings", top_n: int = 20, round_to: int = 9
) -> str:
    """DuckDB twin of :func:`novelty_vs_centroid` (floor-division
    centroid spelled as (s - s % n) / n in BOTH engines so negative
    sums floor identically)."""
    qv = quantize_sql("embedding")
    return f"""
    WITH q AS (SELECT vec_id, label, {qv} AS qv FROM {table}),
    by_dim AS (
      SELECT label,
             CAST(generate_subscripts(qv, 1) - 1 AS INTEGER) AS dim,
             unnest(qv) AS qx
      FROM q
    ),
    sums AS (
      SELECT label, dim, CAST(SUM(qx) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM by_dim GROUP BY 1, 2
    ),
    cdim AS (
      SELECT label, dim,
             CAST((s - ((s % n + n) % n)) / n AS BIGINT) AS cq
      FROM sums
    ),
    cent AS (
      SELECT label, list(cq ORDER BY dim) AS cent
      FROM cdim GROUP BY label
    ),
    scored AS (
      SELECT q.vec_id, q.label,
             ROUND({cosine_sql('q.qv', 'cent.cent')}, {round_to}) AS cosine
      FROM q JOIN cent ON q.label = cent.label
    )
    SELECT vec_id, label, cosine
    FROM scored ORDER BY cosine ASC, vec_id LIMIT {top_n}
    """


def mmr_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    pool: int = 8,
    k: int = 4,
    lam: float = 0.7,
    mu: float = 0.3,
    round_to: int = 9,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — diversified top-k: greedily pick the candidate maximizing

      ``lam * rel(c) - mu * max_{s in selected} sim(c, s)``

    so near-duplicate hits don't crowd the result page (the retrieval
    dual of semdedup). ``lam``/``mu`` are passed as SEPARATE literals
    (never ``1 - lam``: 1-0.7 is not 0.3 in IEEE) so both engines
    score identically; round 1 scores ``lam * rel`` (empty-set max
    term = 0 by convention, documented).

    Scale shape: the candidate POOL is the bounded stage — top-``pool``
    by exact-integer cosine via TakeOrderedAndProject (no shuffle of
    the embedding table); the greedy rounds then run on that tiny set
    (pairwise sims = pool² fixed-width rows, each round a
    one-row argmax), unrolled k times into the plan — iterative
    semantics, zero driver loops over data.

    Output: (rank, vec_id, label, relevance, mmr_score), k rows in
    selection order.
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        quantize("embedding").alias("qq")
    )
    cand = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", quantize("embedding").alias("qv"))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "label", "qv", cosine_expr("qv", "qq").alias("rel")
        )
        .orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(pool)
    )
    # The pool is referenced by the sims self-pair and by every
    # unrolled round (~2k lineages); without a barrier each reference
    # re-runs the full embedding scan + top-k. The pool is `pool`
    # fixed-width rows — materialize it once (same bounded-kernel
    # localCheckpoint pattern as editjoin.py).
    cand = cand.localCheckpoint(eager=False)
    a = cand.select(
        F.col("vec_id").alias("a_id"), F.col("qv").alias("av")
    )
    b = cand.select(
        F.col("vec_id").alias("b_id"), F.col("qv").alias("bv")
    )
    sims = (
        a.join(F.broadcast(b), F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", cosine_expr("av", "bv").alias("sim"))
    )
    sel = (
        cand.orderBy(F.col("rel").desc(), F.col("vec_id"))
        .limit(1)
        .select(
            F.lit(1).cast("int").alias("rank"),
            "vec_id",
            "label",
            "rel",
            (F.lit(lam) * F.col("rel")).alias("score"),
        )
    )
    for r in range(2, k + 1):
        ms = (
            sims.join(
                sel.select(F.col("vec_id").alias("b_id")), "b_id"
            )
            .groupBy("a_id")
            .agg(F.max("sim").alias("maxsim"))
        )
        pick = (
            cand.join(sel.select("vec_id"), "vec_id", "left_anti")
            .join(ms, F.col("vec_id") == F.col("a_id"))
            .select(
                "vec_id",
                "label",
                "rel",
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(mu) * F.col("maxsim")
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("vec_id"))
            .limit(1)
            .select(
                F.lit(r).cast("int").alias("rank"),
                "vec_id",
                "label",
                "rel",
                "score",
            )
        )
        sel = sel.unionByName(pick)
    return sel.select(
        "rank",
        "vec_id",
        "label",
        F.round("rel", round_to).alias("relevance"),
        F.round("score", round_to).alias("mmr_score"),
    ).orderBy("rank")


def mmr_topk_sql(
    table: str = "embeddings",
    query_vec_id: int = 0,
    pool: int = 8,
    k: int = 4,
    lam: float = 0.7,
    mu: float = 0.3,
    round_to: int = 9,
) -> str:
    """DuckDB twin of :func:`mmr_topk` (rounds unrolled as CTEs)."""
    qv = quantize_sql("embedding")
    parts = [
        f"""q AS (SELECT {qv} AS qq FROM {table} WHERE vec_id = {query_vec_id}),
    cand AS (
      SELECT vec_id, label, qv, {cosine_sql('qv', 'qq')} AS rel
      FROM (SELECT vec_id, label, {qv} AS qv FROM {table}
            WHERE vec_id <> {query_vec_id}) e CROSS JOIN q
      ORDER BY rel DESC, vec_id LIMIT {pool}
    ),
    sims AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             {cosine_sql('a.qv', 'b.qv')} AS sim
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    sel1 AS (
      SELECT CAST(1 AS INTEGER) AS rank, vec_id, label, rel,
             {lam!r} * rel AS score
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    ]
    prev = ["sel1"]
    for r in range(2, k + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT vec_id FROM {p}" for p in prev
        )
        parts.append(
            f"""ms{r} AS (
      SELECT a_id, MAX(sim) AS maxsim
      FROM sims WHERE b_id IN ({sel_union})
      GROUP BY a_id
    ),
    sel{r} AS (
      SELECT CAST({r} AS INTEGER) AS rank, c.vec_id, c.label, c.rel,
             {lam!r} * c.rel - {mu!r} * m.maxsim AS score
      FROM cand c JOIN ms{r} m ON c.vec_id = m.a_id
      WHERE c.vec_id NOT IN ({sel_union})
      ORDER BY score DESC, c.vec_id LIMIT 1
    )"""
        )
        prev.append(f"sel{r}")
    union = " UNION ALL ".join(
        f"SELECT rank, vec_id, label, ROUND(rel, {round_to}) AS relevance, "
        f"ROUND(score, {round_to}) AS mmr_score FROM {p}"
        for p in prev
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    {union} ORDER BY rank"


# ──────────────────────────────────────────────────────────────────────────
# wave 88: Johnson-Lindenstrauss random-projection distortion audit
# ──────────────────────────────────────────────────────────────────────────


def _jl_sign_matrix(k: int, dim: int) -> list[list[int]]:
    """Deterministic Rademacher ±1 matrix derived from md5 — a PINNED
    projection artifact both engines inline as literals (no runtime
    hashing; the matrix is row-independent, so hashing per row would be
    pure waste). Public recipe: sign(j, d) = +1 iff the low bit of the
    first md5 byte of "jl:{j}:{d}" is set."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"jl:{j}:{d}".encode()).digest()[0] & 1
            else -1
            for d in range(dim)
        ]
        for j in range(k)
    ]


def jl_distortion_report(
    emb: DataFrame,
    k: int = 16,
    dim: int = 64,
    id_mod: int = 7,
    id_cap: int = 700,
    round_to: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit of a Rademacher random
    projection R^dim -> R^k: for sampled vector pairs, the ratio
    ``(||Ra - Rb||\u00b2 / k) / ||a - b||\u00b2`` whose concentration around 1.0
    is the JL guarantee — the number to check BEFORE swapping full
    embeddings for cheap projections in a dedup or ANN pipeline.

    The \u00b11 matrix is the pinned md5 artifact of
    :func:`_jl_sign_matrix`, but it is DERIVED IN-ENGINE from the same
    recipe (sign(j,d) = +1 iff the first md5 byte of "jl:{j}:{d}" is
    odd) rather than inlined as 1024 literals: everything stays narrow
    element tables — (vec_id, d, val) exploded once, signs broadcast,
    z = one hash aggregate, pair distances two equi-join aggregates —
    no wide rows, no thousand-node expressions (the literal-inline
    form blew the vanilla driver's optimizer heap; narrow joins are
    also the shape that scales). Pairs come from the ABSOLUTE-capped
    deterministic sample ``vec_id % id_mod == 0 AND vec_id < id_cap``
    (the containment_profile discipline: constant kernel cost at any
    corpus size). Output (one row): n_pairs, mean_ratio, min_ratio,
    max_ratio."""
    spark = emb.sparkSession
    sign = (
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("jl:"),
                            F.col("j").cast("string"),
                            F.lit(":"),
                            (F.col("d") - 1).cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("int")
            % 2
            == 1,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("s")
    )
    signs = (
        spark.range(k)
        .select(F.col("id").cast("int").alias("j"))
        .select("j", F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("d"))
        .select("j", "d", sign)
    )
    el = (
        emb.filter(
            (F.col("vec_id") % id_mod == 0) & (F.col("vec_id") < id_cap)
        )
        .select("vec_id", F.posexplode("embedding").alias("d0", "val"))
        .select(
            "vec_id",
            (F.col("d0") + 1).alias("d"),
            F.col("val").cast("double").alias("val"),
        )
    )
    z = (
        el.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("val")).alias("z"))
    )
    dz = (
        z.alias("a")
        .join(z.alias("b"), "j")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .groupBy(
            F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id")
        )
        .agg(
            F.sum(
                (F.col("a.z") - F.col("b.z")) * (F.col("a.z") - F.col("b.z"))
            ).alias("dz")
        )
    )
    dv = (
        el.alias("a")
        .join(el.alias("b"), "d")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .groupBy(
            F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id")
        )
        .agg(
            F.sum(
                (F.col("a.val") - F.col("b.val"))
                * (F.col("a.val") - F.col("b.val"))
            ).alias("dv")
        )
    )
    scored = dz.join(dv, ["a_id", "b_id"]).select(
        ((F.col("dz") / F.lit(float(k))) / F.col("dv")).alias("ratio")
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg("ratio"), round_to).alias("mean_ratio"),
        F.round(F.min("ratio"), round_to).alias("min_ratio"),
        F.round(F.max("ratio"), round_to).alias("max_ratio"),
    )


def jl_distortion_report_sql(
    k: int = 16,
    dim: int = 64,
    id_mod: int = 7,
    id_cap: int = 700,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`jl_distortion_report` (same in-engine md5
    sign recipe, same narrow element-table shape)."""
    return f"""
    WITH signs AS (
      SELECT j.range AS j, d.range AS d,
             CASE WHEN CAST('0x' || substring(
                      md5('jl:' || j.range || ':' || (d.range - 1)), 1, 2)
                    AS INTEGER) % 2 = 1
                  THEN 1.0 ELSE -1.0 END AS s
      FROM range({k}) j CROSS JOIN range(1, {dim + 1}) d
    ),
    el AS (
      SELECT vec_id, d.range AS d,
             CAST(embedding[d.range] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range(1, {dim + 1}) d
      WHERE vec_id % {id_mod} = 0 AND vec_id < {id_cap}
    ),
    z AS (
      SELECT el.vec_id, signs.j, SUM(signs.s * el.val) AS z
      FROM el JOIN signs ON el.d = signs.d
      GROUP BY el.vec_id, signs.j
    ),
    dz AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             SUM((a.z - b.z) * (a.z - b.z)) AS dz
      FROM z a JOIN z b ON a.j = b.j AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    dv AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             SUM((a.val - b.val) * (a.val - b.val)) AS dv
      FROM el a JOIN el b ON a.d = b.d AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    scored AS (
      SELECT (dz.dz / {float(k)!r}) / dv.dv AS ratio
      FROM dz JOIN dv ON dz.a_id = dv.a_id AND dz.b_id = dv.b_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(ratio), {round_to}) AS mean_ratio,
           ROUND(MIN(ratio), {round_to}) AS min_ratio,
           ROUND(MAX(ratio), {round_to}) AS max_ratio
    FROM scored
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 163: exact KNN-Shapley training-data valuation
# ──────────────────────────────────────────────────────────────────────────


def knn_shapley_valuation(
    emb: DataFrame,
    probe_mod: int = 10,
    k: int = 5,
    probe_cap: int = KNN_EVAL_PROBE_CAP,
    top_n: int = 10,
) -> DataFrame:
    """EXACT Shapley value of every training vector under the K-NN
    utility (Jia et al., VLDB 2019) — "which training points actually
    help?", the data-valuation gate a curation pipeline runs before
    paying to keep/label more of a source. Monte-Carlo Shapley needs
    thousands of utility evaluations; for K-NN the exact value has a
    closed recursion over the distance ranking, and that recursion
    TELESCOPES into a pure suffix sum — no iteration anywhere:

      rank candidates per probe by cosine (nearest = 1, id
      tie-break); m_i = 1[label_i = label_probe];
      term_i = m_N/N                        at i = N,
               (m_i − m_{i+1})·min(K,i)/(K·i)  otherwise;
      s_i = Σ_{j≥i} term_j   (one suffix window);
      shapley(train point) = mean of its s over the probe set.

    Efficiency axiom as a built-in invariant (pinned in the wave
    test): per probe, Σ_i s_i = (matches among the K nearest)/K —
    the utility of the full set.

    Scale shape: the knn_label_eval discipline — an ABSOLUTELY
    BOUNDED broadcast probe set, one corpus scan against it
    (O(n·probes) pairs, never a self-join), two windows per probe
    partition (rank + suffix sum), one train-point rollup,
    TakeOrdered(top_n) head/tail. Q20 fixed-point cosines keep the
    ranking bit-reproducible.

    Output: the ``top_n`` highest- and lowest-valued training
    vectors: (position, vec_id, label, n_probes, shapley), position
    1..top_n then -1..-top_n (most valuable first, then most
    harmful), deterministic id tie-breaks.
    """
    from pyspark.sql import Window

    probes = (
        emb.filter(
            (F.col("vec_id") % probe_mod == 0)
            & (F.col("vec_id") < probe_cap)
        )
        .select(
            F.col("vec_id").alias("p_id"),
            F.col("label").alias("p_label"),
            quantize("embedding").alias("pv"),
        )
        .withColumn("pn2", sqnorm_expr("pv"))
    )
    # the probe scan streams `cands` — one parquet split means one
    # task for the whole O(n·probes) cosine kernel without a fan-out
    cands = fan_out(emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        quantize("embedding").alias("cv"),
    )).withColumn("cn2", sqnorm_expr("cv"))
    dot = F.expr(
        "aggregate(zip_with(cv, pv, (x, y) -> x * y), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    pairs = cands.join(
        F.broadcast(probes), F.col("c_id") != F.col("p_id")
    ).select(
        "p_id",
        "p_label",
        "c_id",
        "c_label",
        (
            dot
            / F.sqrt(
                F.col("cn2").cast("double") * F.col("pn2").cast("double")
            )
        ).alias("cos"),
    )
    wk = Window.partitionBy("p_id").orderBy(
        F.col("cos").desc(), F.col("c_id")
    )
    wn = Window.partitionBy("p_id")
    ranked = pairs.select(
        "p_id",
        "c_id",
        (F.col("c_label") == F.col("p_label")).cast("int").alias("m"),
        F.row_number().over(wk).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("nn"),
    ).withColumn(
        "m_next",
        F.lead("m").over(Window.partitionBy("p_id").orderBy("rk")),
    )
    kk = float(int(k))
    term = F.when(
        F.col("rk") == F.col("nn"),
        F.col("m").cast("double") / F.col("nn").cast("double"),
    ).otherwise(
        (F.col("m") - F.col("m_next")).cast("double")
        * F.least(F.lit(kk), F.col("rk").cast("double"))
        / (F.lit(kk) * F.col("rk").cast("double"))
    )
    wsuf = (
        Window.partitionBy("p_id")
        .orderBy("rk")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    scored = ranked.select(
        "p_id", "c_id", F.sum(term).over(wsuf).alias("s")
    )
    per_point = (
        scored.groupBy("c_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.round(F.sum("s") / F.count(F.lit(1)), 6).alias("shapley"),
        )
        .join(
            emb.select(
                F.col("vec_id").alias("c_id"), F.col("label")
            ),
            "c_id",
        )
    )
    # run the expensive probe-scan chain ONCE (eager checkpoint of the
    # one-row-per-corpus-vector rollup), then take head and tail with
    # two distributed orderBy+limit branches (TakeOrderedAndProject).
    # ADVICE r8: the previous single-pass form ranked the FULL rollup
    # through two unpartitioned row_number windows — a single-partition
    # global sort of the whole corpus, a scale regression; TakeOrdered
    # keeps the top-N selection distributed, and the checkpoint keeps
    # the pair scan from executing twice.
    per_point = per_point.localCheckpoint(eager=True)
    w_top = Window.orderBy(F.col("shapley").desc(), F.col("c_id"))
    w_bot = Window.orderBy(F.col("shapley").asc(), F.col("c_id"))
    head = (
        per_point.orderBy(F.col("shapley").desc(), F.col("c_id"))
        .limit(int(top_n))
        .withColumn("position", F.row_number().over(w_top).cast("bigint"))
    )
    tail = (
        per_point.orderBy(F.col("shapley").asc(), F.col("c_id"))
        .limit(int(top_n))
        .withColumn(
            "position", (-F.row_number().over(w_bot)).cast("bigint")
        )
    )
    ranked_out = head.unionByName(tail).select(
        "position",
        F.col("c_id").alias("vec_id"),
        "label",
        "n_probes",
        "shapley",
    )
    return ranked_out.orderBy(F.col("position"))


def knn_shapley_valuation_sql(
    table: str = "embeddings",
    probe_mod: int = 10,
    k: int = 5,
    probe_cap: int = KNN_EVAL_PROBE_CAP,
    top_n: int = 10,
) -> str:
    """DuckDB twin of :func:`knn_shapley_valuation` (same Q20
    cosines, same suffix-sum telescoping, same head/tail cut)."""
    qv = quantize_sql("embedding")
    kk = float(int(k))
    return f"""
    WITH base AS (
      SELECT vec_id, label, {qv} AS v FROM {table}
    ),
    normed AS (
      SELECT vec_id, label, v,
             list_sum([x * x for x in v]) AS n2
      FROM base
    ),
    probes AS (
      SELECT vec_id AS p_id, label AS p_label, v AS pv, n2 AS pn2
      FROM normed
      WHERE vec_id % {probe_mod} = 0 AND vec_id < {probe_cap}
    ),
    pairs AS (
      SELECT p.p_id, p.p_label, c.vec_id AS c_id, c.label AS c_label,
             list_sum([x[1] * x[2] for x in list_zip(c.v, p.pv)])
             / SQRT(CAST(c.n2 AS DOUBLE) * CAST(p.pn2 AS DOUBLE))
               AS cos
      FROM normed c JOIN probes p ON c.vec_id <> p.p_id
    ),
    ranked AS (
      SELECT p_id, c_id,
             CAST(c_label = p_label AS INTEGER) AS m,
             ROW_NUMBER() OVER wk AS rk,
             COUNT(*) OVER (PARTITION BY p_id) AS nn,
             LEAD(CAST(c_label = p_label AS INTEGER)) OVER wk AS m_next
      FROM pairs
      WINDOW wk AS (PARTITION BY p_id ORDER BY cos DESC, c_id)
    ),
    scored AS (
      SELECT p_id, c_id,
             SUM(CASE WHEN rk = nn
                      THEN CAST(m AS DOUBLE) / CAST(nn AS DOUBLE)
                      ELSE CAST(m - m_next AS DOUBLE)
                           * LEAST({kk!r}, CAST(rk AS DOUBLE))
                           / ({kk!r} * CAST(rk AS DOUBLE))
                 END)
               OVER (PARTITION BY p_id ORDER BY rk
                     ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS s
      FROM ranked
    ),
    per_point AS (
      SELECT s.c_id,
             CAST(COUNT(*) AS BIGINT) AS n_probes,
             ROUND(SUM(s.s) / COUNT(*), 6) AS shapley,
             MAX(b.label) AS label
      FROM scored s JOIN base b ON b.vec_id = s.c_id
      GROUP BY s.c_id
    ),
    top AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY shapley DESC, c_id)
                  AS BIGINT) AS position,
             c_id, label, n_probes, shapley
      FROM per_point ORDER BY shapley DESC, c_id LIMIT {int(top_n)}
    ),
    bottom AS (
      SELECT -CAST(ROW_NUMBER() OVER (ORDER BY shapley ASC, c_id)
                   AS BIGINT) AS position,
             c_id, label, n_probes, shapley
      FROM per_point ORDER BY shapley ASC, c_id LIMIT {int(top_n)}
    )
    SELECT position, c_id AS vec_id, label, n_probes, shapley
    FROM (SELECT * FROM top UNION ALL SELECT * FROM bottom)
    ORDER BY position
    """


# ──────────────────────────────────────────────────────────────────────────
# wave 169: linear CKA representation similarity
# ──────────────────────────────────────────────────────────────────────────


def linear_cka_prefix(
    emb: DataFrame,
    prefix_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Linear Centered Kernel Alignment (Kornblith et al., ICML 2019)
    between each vector's FULL representation and its first
    ``prefix_dim`` dimensions — "how much of the embedding geometry
    does the MRL prefix preserve?", the representation-level
    companion to mrl_prefix_recall's retrieval-level answer (recall
    can survive geometry distortion; CKA measures the geometry
    itself):

      CKA(X, Y) = ||Y_c' X_c||²_F / (||X_c' X_c||_F · ||Y_c' Y_c||_F)

    over column-centered X (n×d) and Y (n×p). Everything reduces to
    THREE small Grams (d×d, d×p, p×p): raw cross-moments from one
    row-id self-join of the per-dimension explosion, centered by the
    identity G_c[i,j] = Σx_i y_j − n·μ_i·ν_j (no second pass), then
    three Frobenius reductions over ≤ d² rows. The n×n kernel
    matrices in the definition are NEVER formed — the d×d route is
    the only one that survives scale (n² vs d² — at 100 TB that is
    the whole story). CKA ∈ [0, 1], basis- and scale-invariant.

    Output (one row): (n_vecs, full_dim, prefix_dim, cka).
    """
    p = int(prefix_dim)
    base = emb.select(
        F.col(id_col).alias("rid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).localCheckpoint(eager=False)
    e1 = base.select(
        "rid", F.posexplode("v").alias("i", "xi")
    ).localCheckpoint(eager=False)
    e2 = e1.filter(F.col("i") < p).select(
        "rid", F.col("i").alias("j"), F.col("xi").alias("yj")
    )
    n_row = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max(F.size("v")).alias("d"),
    )
    mx = e1.groupBy("i").agg(F.avg("xi").alias("mi"))
    my = e2.groupBy("j").agg(F.avg("yj").alias("mj"))

    # cross-gram X'Y
    gxy = (
        e1.join(e2, "rid")
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("yj")).alias("s"))
        .join(F.broadcast(mx), "i")
        .join(F.broadcast(my), "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            (
                F.col("s") - F.col("n") * F.col("mi") * F.col("mj")
            ).alias("g")
        )
    )
    # self-grams: reuse e1 against itself / e2 against itself
    e1b = e1.select("rid", F.col("i").alias("j"), F.col("xi").alias("yj"))
    gxx = (
        e1.join(e1b, "rid")
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("yj")).alias("s"))
        .join(F.broadcast(mx), "i")
        .join(
            F.broadcast(mx.select(F.col("i").alias("j"), F.col("mi").alias("mj"))),
            "j",
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            (
                F.col("s") - F.col("n") * F.col("mi") * F.col("mj")
            ).alias("g")
        )
    )
    e2b = e2.select("rid", F.col("j").alias("i"), F.col("yj").alias("xi"))
    gyy = (
        e2b.join(
            e2,
            "rid",
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("yj")).alias("s"))
        .join(
            F.broadcast(my.select(F.col("j").alias("i"), F.col("mj").alias("mi"))),
            "i",
        )
        .join(F.broadcast(my), "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            (
                F.col("s") - F.col("n") * F.col("mi") * F.col("mj")
            ).alias("g")
        )
    )
    fxy = gxy.agg(F.sum(F.col("g") * F.col("g")).alias("f2"))
    fxx = gxx.agg(F.sum(F.col("g") * F.col("g")).alias("f2"))
    fyy = gyy.agg(F.sum(F.col("g") * F.col("g")).alias("f2"))
    return (
        n_row.crossJoin(F.broadcast(fxy.select(F.col("f2").alias("fxy"))))
        .crossJoin(F.broadcast(fxx.select(F.col("f2").alias("fxx"))))
        .crossJoin(F.broadcast(fyy.select(F.col("f2").alias("fyy"))))
        .select(
            F.col("n").alias("n_vecs"),
            F.col("d").cast("bigint").alias("full_dim"),
            F.lit(p).cast("bigint").alias("prefix_dim"),
            F.round(
                F.col("fxy")
                / (F.sqrt(F.col("fxx")) * F.sqrt(F.col("fyy"))),
                round_to,
            ).alias("cka"),
        )
    )


def linear_cka_prefix_sql(
    table: str = "embeddings",
    prefix_dim: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`linear_cka_prefix` (same d×d route,
    same centering identity)."""
    p = int(prefix_dim)
    return f"""
    WITH base AS (
      SELECT {id_col} AS rid,
             CAST({vec_col} AS DOUBLE[]) AS v
      FROM {table}
    ),
    e1 AS (
      SELECT rid,
             CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS i,
             UNNEST(v) AS xi
      FROM base
    ),
    e2 AS (
      SELECT rid, i AS j, xi AS yj FROM e1 WHERE i < {p}
    ),
    nrow AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(LEN(v)) AS BIGINT) AS d
      FROM base
    ),
    mx AS (SELECT i, AVG(xi) AS mi FROM e1 GROUP BY i),
    my AS (SELECT j, AVG(yj) AS mj FROM e2 GROUP BY j),
    gxy AS (
      SELECT a.i, b.j, SUM(a.xi * b.yj) AS s
      FROM e1 a JOIN e2 b USING (rid) GROUP BY 1, 2
    ),
    gxx AS (
      SELECT a.i, b.i AS j, SUM(a.xi * b.xi) AS s
      FROM e1 a JOIN e1 b USING (rid) GROUP BY 1, 2
    ),
    gyy AS (
      SELECT a.j AS i, b.j, SUM(a.yj * b.yj) AS s
      FROM e2 a JOIN e2 b USING (rid) GROUP BY 1, 2
    ),
    fxy AS (
      SELECT SUM((g.s - nrow.n * mx.mi * my.mj)
                 * (g.s - nrow.n * mx.mi * my.mj)) AS f2
      FROM gxy g JOIN mx USING (i) JOIN my USING (j) CROSS JOIN nrow
    ),
    fxx AS (
      SELECT SUM((g.s - nrow.n * a.mi * b.mi)
                 * (g.s - nrow.n * a.mi * b.mi)) AS f2
      FROM gxx g
      JOIN mx a ON a.i = g.i
      JOIN mx b ON b.i = g.j
      CROSS JOIN nrow
    ),
    fyy AS (
      SELECT SUM((g.s - nrow.n * a.mj * b.mj)
                 * (g.s - nrow.n * a.mj * b.mj)) AS f2
      FROM gyy g
      JOIN my a ON a.j = g.i
      JOIN my b ON b.j = g.j
      CROSS JOIN nrow
    )
    SELECT nrow.n AS n_vecs,
           nrow.d AS full_dim,
           CAST({p} AS BIGINT) AS prefix_dim,
           ROUND(fxy.f2 / (SQRT(fxx.f2) * SQRT(fyy.f2)), {round_to})
             AS cka
    FROM nrow, fxy, fxx, fyy
    """
