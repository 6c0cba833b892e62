"""Wave-14 extension specs: hypertable rollup chain, binned interval
overlap join, one-pass Poisson bootstrap, scalar-quantized ANN, and
bigram-LM quality scoring — each oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import bootstrap, intervals, similarity, text, timeseries
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_HOUR = 3600
_DAY = 86400


@_spec(
    "time_bucket_rollup_chain",
    f"""
    SELECT event_type,
           CAST(FLOOR(epoch_us(ts) / {_DAY * 1_000_000}::BIGINT)
                * {_DAY * 1_000_000}::BIGINT AS BIGINT) AS bucket_us,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(user_id) AS BIGINT) AS sum_key,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_us
    FROM events GROUP BY 1, 2
    """,
    "extension — hypertable/continuous-aggregate rollup chain "
    "(operators/timeseries.py time_bucket_rollup + rollup_coarser): "
    "the DAILY grain is derived from the materialized HOURLY rollup, "
    "never from raw events; the oracle aggregates raw events straight "
    "to daily, so equality proves the chain is lossless. At 100 TB "
    "the raw scan happens once and every coarser grain reduces a "
    "table already shrunk by the bucket width (the TimescaleDB / "
    "Druid ingestion-rollup pattern)",
)
def time_bucket_rollup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = timeseries.time_bucket_rollup(
        events, "ts", ["event_type"], _HOUR, "user_id"
    )
    return timeseries.rollup_coarser(hourly, ["event_type"], _DAY)


_GAP_US = 1800 * 1_000_000
#: 1-hour grid for the overlap join bins (epoch micros)
_BIN_US = 3600 * 1_000_000

_SESSIONS_SQL = f"""
    ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL OR t_us - prev_us > {_GAP_US}
                     THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid,
             t_us
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, CAST(sid AS BIGINT) AS sid,
             MIN(t_us) AS start_us, MAX(t_us) AS end_us
      FROM sess GROUP BY user_id, sid
    )
"""


@_spec(
    "interval_overlap_pairs",
    f"""
    WITH {_SESSIONS_SQL},
    lefts AS (SELECT user_id AS l_user, sid AS l_sid, start_us AS l_start,
                     end_us AS l_end
              FROM sessions WHERE user_id % 2 = 0),
    rights AS (SELECT user_id AS r_user, sid AS r_sid, start_us AS r_start,
                      end_us AS r_end
               FROM sessions WHERE user_id % 2 = 1),
    pairs AS (
      SELECT l.l_user, r.r_user
      FROM {intervals.overlap_join_sql('lefts', 'rights', 'l_start', 'l_end',
                                       'r_start', 'r_end')}
    )
    SELECT l_user AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(r_user) AS BIGINT) AS sum_peer_ids
    FROM pairs GROUP BY 1
    """,
    "extension — interval-overlap JOIN without a cartesian "
    "(operators/intervals.py): concurrent-session pairs between two "
    "large session sets. Both sides explode onto a 1-hour grid and "
    "hash-join on the bin; the canonical-bin filter emits each "
    "overlapping pair exactly once. The oracle is the plain theta "
    "join — equality proves the grid plan complete and duplicate-free. "
    "The theta form is a nested-loop at ANY scale; the binned form is "
    "an equi hash join AQE can balance",
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("t_us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("t_us") - F.col("prev_us") > _GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn("sid", F.sum("new_session").over(wrun))
        .groupBy("user_id", "sid")
        .agg(F.min("t_us").alias("start_us"), F.max("t_us").alias("end_us"))
    )
    lefts = sessions.filter(F.col("user_id") % 2 == 0).select(
        F.col("user_id").alias("l_user"),
        F.col("start_us").alias("l_start"),
        F.col("end_us").alias("l_end"),
    )
    rights = sessions.filter(F.col("user_id") % 2 == 1).select(
        F.col("user_id").alias("r_user"),
        F.col("start_us").alias("r_start"),
        F.col("end_us").alias("r_end"),
    )
    pairs = intervals.overlap_join(
        lefts, rights, "l_start", "l_end", "r_start", "r_end", _BIN_US
    )
    return pairs.groupBy(F.col("l_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum("r_user").alias("sum_peer_ids"),
    )


@_spec(
    "poisson_bootstrap_ci",
    bootstrap.poisson_bootstrap_means_sql("documents", "doc_id", "n_chars"),
    "extension — one-pass Poisson bootstrap (operators/bootstrap.py, "
    "Chamandy et al. 2012): 32 bootstrap replicates of mean(n_chars) "
    "from ONE scan, per-(row,replica) Poisson(1) weights derived from "
    "the engine-portable md5 hash family. Weighted sums stay BIGINT; "
    "the replica spread IS the sampling distribution, so uncertainty "
    "on a 100 TB aggregate costs Rx map work and an R-row shuffle — "
    "no resampling passes",
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bootstrap.poisson_bootstrap_means(docs, "doc_id", "n_chars")


@_spec(
    "sq_ann_topk",
    similarity.sq_topk_sql(query_vec_id=7, k=10),
    "extension — scalar-quantized ANN (operators/similarity.py "
    "sq_topk): FAISS-SQ8 shape — corpus vectors stored as 1-byte "
    "codes (4x smaller scans), query kept full-precision, asymmetric "
    "L2 as an exact BIGINT fold under codegen, TakeOrdered top-k. "
    "The oracle runs the identical quantize+ADC pipeline in DuckDB "
    "list algebra; exactness comes from the shared integer grid "
    "(Q20 query, code*2^13 reconstruction)",
)
def sq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.sq_topk(emb, query_vec_id=7, k=10)


@_spec(
    "bigram_logprob_quality",
    text.bigram_logprob_quality_sql(),
    "extension — bigram-LM quality proxy (operators/text.py "
    "bigram_logprob_quality): add-one-smoothed per-doc mean bigram "
    "NLL under the corpus's own distribution — the token-ORDER-aware "
    "step up from unigram_logprob_quality (word salad scores high "
    "even when every token is common). Bigrams are a scan-stage "
    "slice+transform; the Zipf-bounded bigram table broadcasts back; "
    "one doc-keyed aggregation",
)
def bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.bigram_logprob_quality(docs)
