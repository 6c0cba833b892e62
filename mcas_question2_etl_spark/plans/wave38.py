"""Wave-38 extension specs: web-scale curation/feature primitives —
DSIR hashed-ngram importance weights, count-min frequency sketch,
bloom-prefilter joins, per-domain capping, CUSUM changepoint, and
leakage-free out-of-fold target encoding.

Reference scope: the reference repo (pandas/R ETL) has none of these;
they extend the engine's LLM-data-pipeline and analytics surface
(SURVEY.md §2.13) with the operators a 100 TB curation run leans on:
importance-based data selection, sketch-backed frequency stats,
shuffle-avoiding join prefilters, and anti-leakage CV encodings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import bloomjoin, dsir, encoding, sampling, sketches, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# --- DSIR importance weights -------------------------------------------------

@_spec(
    "dsir_importance_weights",
    dsir.dsir_log_weights_sql("lang = 'en'"),
    "training-data op — DSIR (Xie et al. 2023) data selection: per-doc "
    "log importance weight of the raw corpus against the English slice "
    "as target distribution, on a 64-bucket hashed unigram feature "
    "space with add-0.5 smoothing. The bucket log-ratio table is "
    "corpus-size-independent (64 rows) and broadcasts; the corpus "
    "shuffles only (doc_id, bucket) pairs.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dsir.dsir_log_weights(docs, F.col("lang") == "en")


# --- count-min sketch --------------------------------------------------------

@_spec(
    "countmin_user_frequency",
    f"""
    WITH probes AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id LIMIT 10
    ),
    cells AS (
      SELECT cm_row, cm_bucket, CAST(COUNT(*) AS BIGINT) AS cm_count
      FROM (
        {" UNION ALL ".join(
            f"SELECT {r} AS cm_row, "
            f"CAST(('0x' || substring(md5(concat('cm{r}:', "
            f"CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 256 AS cm_bucket "
            "FROM events"
            for r in range(4)
        )}
      ) GROUP BY cm_row, cm_bucket
    ),
    est AS (
      SELECT p.user_id, p.exact_cnt,
             CAST(MIN(c.cm_count) AS BIGINT) AS cm_est
      FROM probes p
      JOIN cells c
        ON c.cm_bucket = CAST(('0x' || substring(md5(concat('cm' || c.cm_row
             || ':', CAST(p.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 256
      GROUP BY p.user_id, p.exact_cnt
    )
    SELECT user_id, exact_cnt, cm_est,
           cm_est - exact_cnt AS overestimate
    FROM est
    """,
    "training-data op — count-min sketch (Cormode & Muthukrishnan "
    "2005): 4x256 salted-hash counter grid over events.user_id; the "
    "top-10 exact heavy hitters probed against the sketch, reporting "
    "the one-sided overestimate. The grid merges by summing counters "
    "(map-side combine carries the reduction); estimates never "
    "undercount.",
)
def countmin_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    exact = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(10)
    )
    est = sketches.countmin_estimate(events, exact.select("user_id"), "user_id")
    return exact.join(F.broadcast(est), "user_id").select(
        "user_id",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") - F.col("exact_cnt")).alias("overestimate"),
    )


# --- bloom prefilter join ----------------------------------------------------

@_spec(
    "bloom_prefilter_join",
    bloomjoin.bloom_join_report_sql(
        "orders",
        "customer",
        "o_custkey",
        "c_custkey",
        build_where="c_mktsegment = 'BUILDING'",
    ),
    "join optimization — explicit bloom-filter join prefilter: "
    "BUILDING-segment customers hashed k=3 times into an m=4096 bit "
    "set, broadcast, and orders prefiltered before the exact join; "
    "reports realized candidate counts and false-positive rate. At "
    "scale the bit set is fixed-size regardless of build cardinality "
    "and survivors alone pay the join shuffle.",
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return bloomjoin.bloom_join_report(orders, cust, "o_custkey", "c_custkey")


# --- per-domain cap ----------------------------------------------------------

@_spec(
    "domain_cap_sample",
    """
    WITH domains AS (
      SELECT doc_id, source,
             source || '-'
               || CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % 7 AS VARCHAR) AS domain
      FROM documents
    ),
    ranked AS (
      SELECT source, domain,
             row_number() OVER (
               PARTITION BY domain
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM domains
    )
    SELECT source,
           CAST(COUNT(DISTINCT domain) AS BIGINT) AS n_domains,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM ranked GROUP BY source
    """,
    "training-data op — per-domain document cap (the C4/RefinedWeb "
    "anti-megadomain rule): docs bucketed into synthetic domains "
    "(source x md5(doc_id)%7), at most 3 kept per domain by "
    "deterministic hash order; per-source kept/total audit. The cap "
    "window partitions on the domain key, so skewed domains discard "
    "in their own partition without a global sort.",
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.col("source"),
            F.lit("-"),
            (
                F.expr(
                    "cast(conv(substring(md5(cast(doc_id as string)), 1, 15),"
                    " 16, 10) as bigint) % 7"
                )
            ).cast("string"),
        ).alias("domain"),
    )
    kept = sampling.cap_per_group(docs, ["domain"], "doc_id", cap=3)
    totals = docs.groupBy("source").agg(
        F.countDistinct("domain").cast("long").alias("n_domains"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    kept_counts = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    return totals.join(kept_counts, "source").select(
        "source", "n_domains", "n_docs", "n_kept"
    )


# --- CUSUM changepoint -------------------------------------------------------

_DAILY_SQL = """
    SELECT CAST(ts AS DATE) AS day, AVG(value) AS daily_mean
    FROM events GROUP BY 1
"""


@_spec(
    "cusum_changepoint",
    timeseries.cusum_changepoint_sql(_DAILY_SQL),
    "time-series op — single-changepoint CUSUM (Page 1954): daily mean "
    "of events.value, prefix-sum CUSUM over the (tiny) daily aggregate, "
    "argmax |S_t| with normalized statistic and pre/post means. Raw "
    "events reduce in a keyed groupBy; only the daily series enters "
    "the ordered window.",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.avg("value").alias("daily_mean")
    )
    return timeseries.cusum_changepoint(daily)


# --- out-of-fold target encoding --------------------------------------------

@_spec(
    "oof_target_encoding",
    encoding.oof_target_encoding_sql(
        "orders", "o_orderpriority", "o_totalprice", "o_orderkey"
    ),
    "ML-pipeline op — leakage-free out-of-fold target encoding: "
    "o_orderpriority mean-encoded against o_totalprice with 5 "
    "deterministic md5 folds on o_orderkey; each (level, fold) cell's "
    "encoding uses only other folds (complement trick over one "
    "(level,fold) groupBy + a window over the tiny aggregate).",
)
def oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return encoding.oof_target_encoding(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey"
    )
