"""Wave-6 extension specs: scorer evaluation (AUC, Welch t-test),
robust winsorized stats, vocabulary coverage, per-source distribution
divergence, calendar gap-fill + LOCF, incremental batch dedup, and
decile profiling.

These extend the analytics layer the reference ends at (summary stats +
GLM, school_outcomes_etl.py) with the evaluation/profiling statistics a
corpus-scale scoring pipeline needs, each expressed as grouped
aggregates + bounded windows — never a global per-row sort over raw
data, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import evaluation as _eval
from ..operators import ranking as _rank
from ..operators import timeseries as _ts
from ..operators.sampling import hash_bucket, hash_bucket_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "auc_quality_score",
    _eval.auc_rank_sum_sql("documents", "n_chars", "lang = 'en'"),
    "extension — scorer evaluation: Mann-Whitney AUC with tie-averaged "
    "ranks (operators/evaluation.py). Grouped-by-distinct-score "
    "formulation: the only window runs over distinct scores, not rows, "
    "so the global sort is over score cardinality — bounded at any "
    "data scale",
)
def auc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return _eval.auc_rank_sum(docs, F.col("n_chars"), F.col("lang") == "en")


@_spec(
    "welch_ttest_click_purchase",
    _eval.welch_ttest_sql("events", "value", "event_type", "click", "purchase"),
    "extension — cohort significance test: Welch unequal-variance "
    "t-test (operators/evaluation.py), one conditional-moment "
    "aggregate pass, closed-form t and Welch-Satterthwaite dof; zero "
    "joins, zero windows",
)
def welch_ttest_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return _eval.welch_ttest(
        ev, F.col("value"), F.col("event_type"), "click", "purchase"
    )


@_spec(
    "winsorized_price_stats",
    """
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    q AS (
      SELECT l_returnflag,
             MAX(CASE WHEN rn = 1 + CAST(FLOOR((n - 1) * 0.05) AS BIGINT)
                      THEN l_extendedprice END) AS p05,
             MAX(CASE WHEN rn = 1 + CAST(FLOOR((n - 1) * 0.95) AS BIGINT)
                      THEN l_extendedprice END) AS p95
      FROM r GROUP BY 1
    )
    SELECT r.l_returnflag, q.p05, q.p95,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(r.l_extendedprice), 4) AS mean_raw,
           ROUND(AVG(LEAST(GREATEST(r.l_extendedprice, q.p05), q.p95)), 4)
             AS mean_winsorized
    FROM r JOIN q ON r.l_returnflag = q.l_returnflag
    GROUP BY 1, 2, 3 ORDER BY 1
    """,
    "extension — robust statistics: per-group 5/95 winsorized mean "
    "with index-picked percentiles (element at floor((n-1)*q) of the "
    "per-group total order — no interpolation, bit-identical on any "
    "engine; same discipline as robust_outliers_iqr). One shuffle for "
    "the per-group sort; the tiny percentile table broadcasts back",
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    r = li.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    p05_idx = 1 + F.floor((F.col("n") - 1) * 0.05)
    p95_idx = 1 + F.floor((F.col("n") - 1) * 0.95)
    q = r.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("rn") == p05_idx, F.col("l_extendedprice"))).alias("p05"),
        F.max(F.when(F.col("rn") == p95_idx, F.col("l_extendedprice"))).alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
    )
    return (
        r.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag", "p05", "p95")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_extendedprice"), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_winsorized"),
        )
        .orderBy("l_returnflag")
    )


#: coverage checkpoints for the vocabulary curve
_VOCAB_RANKS = (10, 50, 100, 500)


@_spec(
    "vocab_coverage_curve",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS cnt FROM tok
      WHERE token <> '' GROUP BY 1
    ),
    ranked AS (
      SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rn,
             SUM(cnt) OVER (ORDER BY cnt DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(cnt) OVER () AS total
      FROM counts
    )
    SELECT v.vocab_size,
           CAST(COUNT(CASE WHEN rn <= v.vocab_size THEN 1 END) AS BIGINT)
             AS n_types,
           ROUND(MAX(CASE WHEN rn <= v.vocab_size THEN cum END)
                 / CAST(MAX(total) AS DOUBLE), 6) AS coverage
    FROM ranked CROSS JOIN
         (SELECT unnest({list(_VOCAB_RANKS)}) AS vocab_size) v
    GROUP BY 1 ORDER BY 1
    """,
    "training-data op — vocabulary coverage curve: what fraction of "
    "the corpus' token mass the top-V types cover, at V in "
    f"{_VOCAB_RANKS}. Tokenize+count is one explode+groupBy (map-side "
    "partial); the rank window runs over DISTINCT TYPES only (vocab "
    "cardinality, not corpus size) — the standard tokenizer-sizing "
    "diagnostic before a BPE train",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = counts.select(
        "cnt",
        F.row_number().over(w).alias("rn"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    sizes = F.explode(
        F.array(*[F.lit(v) for v in _VOCAB_RANKS])
    ).alias("vocab_size")
    return (
        ranked.select("rn", "cum", "total", sizes)
        .groupBy("vocab_size")
        .agg(
            F.count(F.when(F.col("rn") <= F.col("vocab_size"), 1)).alias(
                "n_types"
            ),
            F.round(
                F.max(F.when(F.col("rn") <= F.col("vocab_size"), F.col("cum")))
                / F.max("total").cast("double"),
                6,
            ).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


@_spec(
    "source_token_divergence",
    """
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    clean AS (SELECT * FROM tok WHERE token <> ''),
    global_top AS (
      SELECT token, cnt FROM (
        SELECT token, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rn
        FROM clean GROUP BY 1
      ) WHERE rn <= 100
    ),
    q AS (
      SELECT token, cnt / CAST(SUM(cnt) OVER () AS DOUBLE) AS q_prob
      FROM global_top
    ),
    per_source AS (
      SELECT c.source, c.token, COUNT(*) AS cnt
      FROM clean c JOIN q ON c.token = q.token
      GROUP BY 1, 2
    ),
    p AS (
      SELECT source, token,
             cnt / CAST(SUM(cnt) OVER (PARTITION BY source) AS DOUBLE)
               AS p_prob
      FROM per_source
    )
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_top_tokens,
           ROUND(-SUM(p_prob * LN(p_prob)), 4) AS entropy,
           ROUND(SUM(p_prob * LN(p_prob / q_prob)), 4) AS kl_from_global
    FROM p JOIN q ON p.token = q.token
    GROUP BY 1 ORDER BY 1
    """,
    "training-data op — per-source token-distribution divergence: "
    "entropy and KL(source || corpus) over the top-100 global types "
    "(renormalized), the data-mixing diagnostic for domain weighting. "
    "Token counting is explode+groupBy; the top-100 table is tiny and "
    "BROADCAST into the per-source recount, so nothing but (source, "
    "token) aggregates ever shuffles",
)
def source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clean = docs.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = clean.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    top = counts.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 100
    )
    q = top.select(
        "token",
        (F.col("cnt") / F.sum("cnt").over(Window.partitionBy()).cast("double"))
        .alias("q_prob"),
    )
    per_source = (
        clean.join(F.broadcast(q.select("token")), "token")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p = per_source.select(
        "source",
        "token",
        (
            F.col("cnt")
            / F.sum("cnt").over(Window.partitionBy("source")).cast("double")
        ).alias("p_prob"),
    )
    return (
        p.join(F.broadcast(q), "token")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_top_tokens"),
            F.round(-F.sum(F.col("p_prob") * F.log("p_prob")), 4).alias(
                "entropy"
            ),
            F.round(
                F.sum(F.col("p_prob") * F.log(F.col("p_prob") / F.col("q_prob"))),
                4,
            ).alias("kl_from_global"),
        )
        .orderBy("source")
    )


@_spec(
    "events_daily_gapfill_locf",
    """
    WITH span AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span
    ),
    grid AS (
      SELECT e.event_type, s.day
      FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) e
    ),
    per_day AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             AVG(value) AS day_avg_value
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.day,
           CAST(COALESCE(p.n_events, 0) AS BIGINT) AS n_events,
           p.day_avg_value,
           last_value(p.day_avg_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS day_avg_value_locf
    FROM grid g LEFT JOIN per_day p
      ON g.event_type = p.event_type AND g.day = p.day
    ORDER BY 1, 2
    """,
    "extension — time-series regularization (operators/timeseries.py): "
    "calendar-spine gap fill per event_type with zero-filled counts and "
    "last-observation-carried-forward daily means. The outer join "
    "shuffles per-(series, day) AGGREGATES, never raw events; LOCF is "
    "one ignore-nulls window on the same series-key exchange",
)
def events_daily_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dense = _ts.gapfill_locf(
        ev,
        "ts",
        "event_type",
        [
            F.count(F.lit(1)).alias("n_events"),
            # deliberately un-rounded: an explicit ROUND can land on a
            # half-tie where engines' double rounding diverges; the
            # gate's 9-significant-digit canonicalization absorbs ULPs
            F.avg("value").alias("day_avg_value"),
        ],
        "day_avg_value",
    )
    return dense.select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "day_avg_value",
        "day_avg_value_locf",
    ).orderBy("event_type", "day")


@_spec(
    "dedup_incremental_batch",
    f"""
    WITH tagged AS (
      SELECT source, doc_id, md5(text) AS fp,
             {hash_bucket_sql("doc_id")} < 80 AS in_corpus
      FROM documents
    ),
    corpus_fp AS (
      SELECT DISTINCT fp FROM tagged WHERE in_corpus
    ),
    batch AS (
      SELECT t.source, t.doc_id, t.fp,
             c.fp IS NOT NULL AS hits_corpus,
             MIN(t.doc_id) OVER (PARTITION BY t.fp) AS first_id
      FROM tagged t LEFT JOIN corpus_fp c ON t.fp = c.fp
      WHERE NOT t.in_corpus
    )
    SELECT source,
           CASE WHEN hits_corpus THEN 'dup_of_corpus'
                WHEN doc_id = first_id THEN 'kept'
                ELSE 'dup_within_batch' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM batch GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "training-data op — INCREMENTAL dedup: a new batch (the 20% "
    "hash-bucket slice; same stable-membership discipline as "
    "train_test_split) deduped against the standing corpus by content "
    "fingerprint, then within itself (min-doc_id winner). The "
    "continuous-ingestion shape of dedup_exact: only 32-hex "
    "fingerprints shuffle — document bodies never leave their scan — "
    "and corpus membership is a fingerprint-only left join",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "source",
        "doc_id",
        F.md5("text").alias("fp"),
        (hash_bucket("doc_id") < 80).alias("in_corpus"),
    )
    corpus_fp = (
        tagged.filter("in_corpus").select("fp").distinct()
        .withColumn("hits_corpus", F.lit(True))
    )
    batch = (
        tagged.filter(~F.col("in_corpus"))
        .join(corpus_fp, "fp", "left")
        .withColumn(
            "hits_corpus", F.coalesce("hits_corpus", F.lit(False))
        )
        .withColumn(
            "first_id", F.min("doc_id").over(Window.partitionBy("fp"))
        )
    )
    status = (
        F.when(F.col("hits_corpus"), "dup_of_corpus")
        .when(F.col("doc_id") == F.col("first_id"), "kept")
        .otherwise("dup_within_batch")
    )
    return (
        batch.select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "status")
    )


@_spec(
    "ntile_price_deciles",
    """
    WITH d AS (
      SELECT o_totalprice,
             CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                  AS INTEGER) AS decile
      FROM orders
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi,
           ROUND(AVG(o_totalprice), 4) AS mean
    FROM d GROUP BY 1 ORDER BY 1
    """,
    "extension — equal-frequency decile profile with NTILE(10) "
    "semantics, computed by the two-phase distributed rank "
    "(operators/ranking.py): range-shuffle on the sort key, "
    "per-partition row_number windows, tiny broadcast offset table, "
    "closed-form ntile from (rn, n). A naive ntile() OVER (ORDER BY) "
    "window would collapse the table into ONE task — this stays "
    "parallel at any scale. Unique-key tiebreak (o_orderkey) makes "
    "bucket edges deterministic",
)
def ntile_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    bucketed = _rank.with_ntile(
        orders, ["o_totalprice", "o_orderkey"], 10, out_col="decile"
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            F.round(F.avg("o_totalprice"), 4).alias("mean"),
        )
        .orderBy("decile")
    )
