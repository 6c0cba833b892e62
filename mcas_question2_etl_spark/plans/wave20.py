"""Wave-20 extension spec: NDCG@k retrieval evaluation — the graded
ranking metric closing the evaluation family (AUC, Welch t, chi-square,
calibration) for the retrieval stack (bm25_topk, tfidf_top_terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.evaluation import ndcg_at_k
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_TERMS = ("spark", "window", "join")
_K = 10


def _terms_in() -> str:
    return ", ".join(f"'{t}'" for t in _TERMS)


@_spec(
    "ndcg_retrieval_eval",
    f"""
    WITH tf AS (
      SELECT t.term AS qid, d.doc_id,
             CAST(len(list_filter(string_split(d.text, ' '), w -> w = t.term))
                  AS BIGINT) AS rel
      FROM documents d CROSS JOIN (SELECT unnest([{_terms_in()}]) AS term) t
    ),
    cands AS (SELECT * FROM tf WHERE rel > 0),
    n_docs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    dfreq AS (SELECT qid, CAST(COUNT(*) AS DOUBLE) AS df FROM cands GROUP BY 1),
    scored AS (
      SELECT c.qid, c.doc_id, c.rel,
             c.rel * ln(1 + (n.n - f.df + 0.5) / (f.df + 0.5)) AS score
      FROM cands c JOIN dfreq f USING (qid) CROSS JOIN n_docs n
    ),
    ranked AS (
      SELECT qid, rel,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, rel DESC) AS r,
             row_number() OVER (PARTITION BY qid
                                ORDER BY rel DESC, score DESC) AS ri,
             power(2.0, rel) - 1 AS g
      FROM scored
    )
    SELECT qid,
           SUM(CASE WHEN r <= {_K} THEN g / log2(r + 1) ELSE 0 END) AS dcg,
           SUM(CASE WHEN ri <= {_K} THEN g / log2(ri + 1) ELSE 0 END) AS idcg,
           SUM(CASE WHEN r <= {_K} THEN g / log2(r + 1) ELSE 0 END)
             / SUM(CASE WHEN ri <= {_K} THEN g / log2(ri + 1) ELSE 0 END) AS ndcg
    FROM ranked GROUP BY 1
    """,
    "extension — NDCG@10 retrieval evaluation "
    "(operators/evaluation.py ndcg_at_k, Jarvelin-Kekalainen "
    "exponential-gain form): three single-term queries ranked by "
    "tf-idf, graded relevance = raw term frequency, DCG/IDCG/NDCG per "
    "query. Tie order cannot change the sums (equal gains at equal "
    "rank sets), so the metric is deterministic under any "
    "partitioning. Candidates are filtered AT THE SCAN to docs "
    "containing the term, so the per-query windows run over matches, "
    "not the corpus — the eval loop stays cheap enough to gate every "
    "index build",
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = spark.createDataFrame([(t,) for t in _TERMS], "term string")
    tf = (
        docs.crossJoin(F.broadcast(terms))
        .select(
            F.col("term").alias("qid"),
            "doc_id",
            F.size(
                F.expr("filter(split(text, ' '), w -> w = term)")
            ).cast("long").alias("rel"),
        )
        .filter(F.col("rel") > 0)
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    dfreq = tf.groupBy("qid").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "qid")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "qid",
            "doc_id",
            "rel",
            (
                F.col("rel")
                * F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            ).alias("score"),
        )
    )
    return ndcg_at_k(scored, "qid", "score", "rel", _K)
