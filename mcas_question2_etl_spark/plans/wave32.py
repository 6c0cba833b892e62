"""Wave-32 extension specs: token-language mutual information
(feature selection) and TF-IDF document-to-document similarity
(sparse-vector retrieval without embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_MI_TOP = 15


@_spec(
    "token_lang_mutual_info",
    f"""
    WITH docs_t AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
      FROM documents
    ),
    pres AS (
      SELECT lang, unnest(toks) AS t FROM docs_t
    ),
    n_t AS (SELECT t, COUNT(*) AS c1 FROM pres GROUP BY t),
    n_ty AS (SELECT t, lang, COUNT(*) AS c11 FROM pres GROUP BY t, lang),
    n_y AS (SELECT lang, COUNT(*) AS ny FROM docs_t GROUP BY lang),
    n AS (SELECT COUNT(*) AS n FROM docs_t),
    -- joint cells: present/absent x lang, zero-safe via xlogx(0)=0
    cells AS (
      SELECT t.t, y.lang,
             COALESCE(j.c11, 0) AS c11,
             y.ny - COALESCE(j.c11, 0) AS c01,
             t.c1, y.ny, n.n
      FROM n_t t CROSS JOIN n_y y CROSS JOIN n
      LEFT JOIN n_ty j ON j.t = t.t AND j.lang = y.lang
    ),
    mi AS (
      SELECT t,
             SUM(
               CASE WHEN c11 > 0 THEN (CAST(c11 AS DOUBLE) / n)
                    * ln((CAST(c11 AS DOUBLE) * n)
                         / (CAST(c1 AS DOUBLE) * ny)) ELSE 0 END
               + CASE WHEN c01 > 0 THEN (CAST(c01 AS DOUBLE) / n)
                      * ln((CAST(c01 AS DOUBLE) * n)
                           / (CAST(n - c1 AS DOUBLE) * ny)) ELSE 0 END
             ) AS mi
      FROM cells GROUP BY t
    )
    SELECT t AS token, mi,
           CAST(row_number() OVER (ORDER BY mi DESC, t) AS BIGINT) AS rnk
    FROM mi
    QUALIFY rnk <= {_MI_TOP}
    ORDER BY rnk
    """,
    "extension — mutual information I(token presence; language): the "
    "classic feature-selection statistic, here ranking which tokens "
    "identify a document's language (the supervised upgrade of "
    "language_id's hand-picked cue lists — run this to LEARN the cue "
    "lists). All counts come from one distinct-presence explode with "
    "map-side combine; the MI table is vocab x langs (tiny), and the "
    "zero cells a naive join would drop are restored by the marginal "
    "cross join, with xlogx(0)=0 handled explicitly",
)
def token_lang_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    docs_t = docs.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    pres = docs_t.select("lang", F.explode("toks").alias("t"))
    n_t = pres.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    n_ty = pres.groupBy("t", "lang").agg(F.count(F.lit(1)).alias("c11"))
    n_y = docs_t.groupBy("lang").agg(F.count(F.lit(1)).alias("ny"))
    n = docs_t.agg(F.count(F.lit(1)).alias("n"))
    cells = (
        n_t.crossJoin(F.broadcast(n_y))
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(n_ty), ["t", "lang"], "left")
        .select(
            "t",
            "lang",
            F.coalesce("c11", F.lit(0)).alias("c11"),
            (F.col("ny") - F.coalesce("c11", F.lit(0))).alias("c01"),
            "c1",
            "ny",
            "n",
        )
    )
    term11 = F.when(
        F.col("c11") > 0,
        (F.col("c11").cast("double") / F.col("n"))
        * F.log(
            (F.col("c11").cast("double") * F.col("n"))
            / (F.col("c1").cast("double") * F.col("ny"))
        ),
    ).otherwise(0.0)
    term01 = F.when(
        F.col("c01") > 0,
        (F.col("c01").cast("double") / F.col("n"))
        * F.log(
            (F.col("c01").cast("double") * F.col("n"))
            / ((F.col("n") - F.col("c1")).cast("double") * F.col("ny"))
        ),
    ).otherwise(0.0)
    mi = cells.groupBy("t").agg(F.sum(term11 + term01).alias("mi"))
    w = Window.orderBy(F.col("mi").desc(), F.col("t"))
    return (
        mi.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _MI_TOP)
        .select(F.col("t").alias("token"), "mi", "rnk")
        .orderBy("rnk")
    )


_QUERY_DOC = 42
_SIM_TOP = 10


@_spec(
    "tfidf_doc_similarity",
    f"""
    WITH tf AS (
      SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      GROUP BY doc_id, t
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    df AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY t),
    w AS (
      SELECT tf.doc_id, tf.t, tf.tf * ln(n.n / df.df) AS w
      FROM tf JOIN df USING (t) CROSS JOIN n
    ),
    norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id),
    q AS (SELECT t, w FROM w WHERE doc_id = {_QUERY_DOC}),
    dots AS (
      SELECT w.doc_id, SUM(w.w * q.w) AS dot
      FROM w JOIN q USING (t)
      WHERE w.doc_id <> {_QUERY_DOC}
      GROUP BY w.doc_id
    ),
    scored AS (
      SELECT d.doc_id,
             d.dot / (na.nrm * nq.nrm) AS cosine
      FROM dots d
      JOIN norms na USING (doc_id)
      CROSS JOIN (SELECT nrm FROM norms WHERE doc_id = {_QUERY_DOC}) nq
    )
    SELECT doc_id, cosine FROM scored
    ORDER BY cosine DESC, doc_id LIMIT {_SIM_TOP}
    """,
    "extension — TF-IDF document-to-document retrieval: sparse-vector "
    "cosine top-k WITHOUT embeddings (the lexical half of hybrid "
    "search; bm25_topk is query-to-doc, this is doc-to-doc). The "
    "sparse dot product touches only postings of the QUERY's terms "
    "(broadcast query vector into the postings join); norms are one "
    "doc-keyed aggregation; global top-k is TakeOrdered. Zero dense "
    "vectors anywhere — at 100 TB the postings join shuffles "
    "(term-hash, doc, weight) triples only for matched terms",
)
def tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .localCheckpoint(eager=False)
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    w = (
        tf.join(F.broadcast(dfreq), "t")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "t",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    q = w.filter(F.col("doc_id") == _QUERY_DOC).select(
        "t", F.col("w").alias("qw")
    )
    dots = (
        w.filter(F.col("doc_id") != _QUERY_DOC)
        .join(F.broadcast(q), "t")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    qnorm = norms.filter(F.col("doc_id") == _QUERY_DOC).select(
        F.col("nrm").alias("qnrm")
    )
    return (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .select(
            "doc_id", (F.col("dot") / (F.col("nrm") * F.col("qnrm"))).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id"))
        .limit(_SIM_TOP)
    )
