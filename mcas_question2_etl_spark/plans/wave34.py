"""Wave-34 extension specs: rendezvous (HRW) shard assignment — the
consistent-hashing answer to resharding churn — and an emerging-terms
report (frequency risers between corpus halves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_N_SHARDS = 16


def hrw_shard_expr(key_col: str, n_shards: int) -> F.Column:
    """Highest-random-weight (rendezvous) shard pick: argmax over
    shards of the portable md5 hash of key#shard. Unlike modulo
    bucketing, growing the shard set only moves keys INTO new shards
    (everything else keeps its argmax) — the property that makes
    resharding a 100 TB corpus an incremental copy, not a reshuffle."""
    weights = ", ".join(
        "named_struct('w', cast(conv(substring(md5(concat(cast("
        f"{key_col} as string), '#', '{s}')), 1, 15), 16, 10) as bigint), 's', {s})"
        for s in range(n_shards)
    )
    return F.expr(
        f"array_max(array({weights})).s"
    ).cast("int")


def hrw_shard_sql(key_col: str, n_shards: int) -> str:
    """DuckDB twin (same hash family, same BIGINT weight compare)."""
    weights = ", ".join(
        f"{{'w': CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR) "
        f"|| '#' || '{s}'), 1, 15)) AS BIGINT), 's': {s}}}"
        for s in range(n_shards)
    )
    return f"CAST(list_max([{weights}]).s AS INTEGER)"


@_spec(
    "hrw_shard_assignment",
    f"""
    SELECT {hrw_shard_sql('doc_id', _N_SHARDS)} AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
    FROM documents GROUP BY 1
    """,
    "extension — rendezvous/HRW sharding: each doc goes to the shard "
    "with the highest hash(doc#shard) — consistent-hashing placement "
    "where ADDING a shard steals ~1/(n+1) of keys and moves them ONLY "
    "into the new shard (pytest-pinned), versus modulo bucketing "
    "where nearly every key moves. The argmax is one scan-stage "
    "array_max over n_shards named structs — no shuffle, no "
    "coordination; complements shard_manifest (fixed-count export) "
    "with the grow-the-cluster story",
)
def hrw_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        hrw_shard_expr("doc_id", _N_SHARDS).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_ids"),
    )


_SMOOTH = 5.0
_TOP = 15


@_spec(
    "emerging_terms_report",
    f"""
    WITH halves AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'old' ELSE 'new' END AS half,
             unnest(string_split(text, ' ')) AS t
      FROM documents
    ),
    counts AS (
      SELECT t,
             SUM(CASE WHEN half = 'old' THEN 1 ELSE 0 END) AS c_old,
             SUM(CASE WHEN half = 'new' THEN 1 ELSE 0 END) AS c_new
      FROM halves GROUP BY t
    ),
    tots AS (SELECT SUM(c_old) AS n_old, SUM(c_new) AS n_new FROM counts),
    scored AS (
      SELECT t, CAST(c_old AS BIGINT) AS c_old, CAST(c_new AS BIGINT) AS c_new,
             ((c_new + {_SMOOTH}) / (tt.n_new + {_SMOOTH}))
               / ((c_old + {_SMOOTH}) / (tt.n_old + {_SMOOTH})) AS rise
      FROM counts CROSS JOIN tots tt
    )
    SELECT t AS term, c_old, c_new, rise,
           CAST(row_number() OVER (ORDER BY rise DESC, t) AS BIGINT) AS rnk
    FROM scored
    QUALIFY rnk <= {_TOP}
    ORDER BY rnk
    """,
    "extension — emerging-terms report: which tokens RISE most in "
    "relative frequency between the old and new corpus halves "
    "(smoothed rate ratio — the trend detector run between crawl "
    "snapshots to catch topic drift before it skews a training mix). "
    "One token-count aggregation carries both halves as conditional "
    "sums (single corpus scan); the ranking window runs over the "
    "Zipf-tiny vocabulary",
)
def emerging_terms_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    halves = docs.select(
        F.when(F.col("doc_id") % 2 == 0, "old").otherwise("new").alias("half"),
        F.explode(F.split("text", " ")).alias("t"),
    )
    counts = halves.groupBy("t").agg(
        F.sum((F.col("half") == "old").cast("long")).alias("c_old"),
        F.sum((F.col("half") == "new").cast("long")).alias("c_new"),
    )
    tots = counts.agg(
        F.sum("c_old").alias("n_old"), F.sum("c_new").alias("n_new")
    )
    scored = counts.crossJoin(F.broadcast(tots)).select(
        "t",
        "c_old",
        "c_new",
        (
            ((F.col("c_new") + _SMOOTH) / (F.col("n_new") + _SMOOTH))
            / ((F.col("c_old") + _SMOOTH) / (F.col("n_old") + _SMOOTH))
        ).alias("rise"),
    )
    w = Window.orderBy(F.col("rise").desc(), F.col("t"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= _TOP)
        .select(F.col("t").alias("term"), "c_old", "c_new", "rise", "rnk")
        .orderBy("rnk")
    )
