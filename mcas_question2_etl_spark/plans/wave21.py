"""Wave-21 extension specs: quality-aware dedup survivorship,
temperature-based domain mixture sampling, and event-lateness
accounting (the watermark-sizing report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import clustering, sampling
from ..operators.sampling import hash_bucket_sql
from ..registry import QuerySpec
from .data_pipeline import _LSH_PAIRS_SQL

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "dedup_keep_longest",
    f"""
    WITH RECURSIVE lshp AS ({_LSH_PAIRS_SQL}),
    edges AS (SELECT a_id, b_id FROM lshp WHERE jaccard >= 0.6),
    sym AS (SELECT a_id AS src, b_id AS dst FROM edges
            UNION ALL SELECT b_id, a_id FROM edges),
    nodes AS (SELECT doc_id FROM documents),
    reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
    ),
    comp AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
             FROM reach GROUP BY node),
    scored AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           doc_id AS survivor_id,
           CAST(sz AS BIGINT) AS cluster_size,
           n_chars AS best_quality
    FROM (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS sz
      FROM scored
    ) WHERE rn = 1
    """,
    "training-data op — quality-aware dedup survivorship "
    "(operators/clustering.py canonicalize_by): near-dup clusters "
    "(LSH pairs -> connected components) keep their LONGEST member "
    "instead of min-id — the keep-the-best-duplicate policy real "
    "corpus dedups want once a ranking signal exists (longest "
    "version, quality score, freshest crawl — the policy is one "
    "ORDER BY). Survivor pick is WindowGroupLimit over cluster "
    "members; the oracle replays the whole chain incl. the recursive "
    "BFS closure and the same argmax",
)
def dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .data_pipeline import _neardup_components

    docs = load_table(spark, sf_dir, "documents")
    # component labels shared with neardup_cluster_dedup via the
    # session-scoped materialization (VERDICT r3 #5) — the survivor
    # policy is the only per-spec work
    comp = _neardup_components(spark, sf_dir)
    return clustering.canonicalize_by(
        comp, docs.select("doc_id", "n_chars"), "n_chars"
    )


_ALPHA = 0.5
_BUDGET = 300
_BUCKETS = 1_000_000


@_spec(
    "temperature_mixture_sample",
    f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ),
    z AS (SELECT SUM(power(CAST(n AS DOUBLE), {_ALPHA})) AS z FROM counts),
    rates AS (
      SELECT source, n,
             power(CAST(n AS DOUBLE), {_ALPHA}) / z.z AS share,
             LEAST(1.0, {float(_BUDGET)} * (power(CAST(n AS DOUBLE), {_ALPHA}) / z.z) / n)
               AS rate
      FROM counts CROSS JOIN z
    ),
    kept AS (
      SELECT d.source FROM documents d JOIN rates r USING (source)
      WHERE CAST({hash_bucket_sql('doc_id', _BUCKETS)} AS DOUBLE) / {_BUCKETS}
            < r.rate
    )
    SELECT r.source, r.n AS n_docs, r.rate,
           CAST(COALESCE(k.c, 0) AS BIGINT) AS n_kept
    FROM rates r
    LEFT JOIN (SELECT source, COUNT(*) AS c FROM kept GROUP BY 1) k
      USING (source)
    """,
    "training-data op — temperature-based mixture sampling "
    "(operators/sampling.py temperature_sample; the mT5/XLM-R "
    "multilingual allocation rule): per-domain keep rate "
    "min(1, budget * n^alpha / (n * sum n^alpha)) with alpha=0.5 "
    "flattening the head, applied as the same deterministic "
    "monotone hash filter as mixture_sample. One aggregation builds "
    "the domains-sized rate table, which broadcasts into a scan-side "
    "filter — the corpus shuffles nothing",
)
def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rates = sampling.temperature_rates(docs, "source", _ALPHA, _BUDGET)
    kept = sampling.temperature_sample(
        docs, "doc_id", "source", _ALPHA, _BUDGET, _BUCKETS
    )
    kept_counts = kept.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    return (
        rates.join(F.broadcast(kept_counts), "source", "left")
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "rate",
            F.coalesce("c", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


@_spec(
    "late_arrival_report",
    """
    WITH arr AS (
      SELECT event_type, event_id, epoch_us(ts) AS t_us,
             MAX(epoch_us(ts)) OVER (PARTITION BY event_type
                                     ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS hw_us
      FROM events
    ),
    lat AS (
      SELECT event_type, hw_us - t_us AS late_us FROM arr
    )
    SELECT event_type,
           CASE WHEN late_us = 0 THEN 'on-time'
                WHEN late_us < 60 * 1000000 THEN 'lt-1m'
                WHEN late_us < 3600 * 1000000::BIGINT THEN 'lt-1h'
                WHEN late_us < 86400 * 1000000::BIGINT THEN 'lt-1d'
                ELSE 'ge-1d' END AS lateness,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us
    FROM lat GROUP BY 1, 2
    """,
    "extension — event-lateness accounting: per event type, how far "
    "behind the running event-time high-watermark (over arrival "
    "order) each event arrives, bucketed into the delays that matter "
    "for watermark sizing. THE report you run before choosing "
    "withWatermark's delay (streaming/windows.py): the bucket "
    "histogram tells you directly what fraction of events a 1m/1h/1d "
    "watermark would drop. One shuffle (event_type), window over "
    "arrival order, integer micros end to end",
)
def late_arrival_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = events.select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.max(F.unix_micros("ts")).over(w).alias("hw_us"),
    ).withColumn("late_us", F.col("hw_us") - F.col("t_us"))
    lateness = (
        F.when(F.col("late_us") == 0, "on-time")
        .when(F.col("late_us") < 60 * 1_000_000, "lt-1m")
        .when(F.col("late_us") < 3600 * 1_000_000, "lt-1h")
        .when(F.col("late_us") < 86400 * 1_000_000, "lt-1d")
        .otherwise("ge-1d")
    )
    return arr.groupBy("event_type", lateness.alias("lateness")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("late_us").alias("max_late_us"),
    )
