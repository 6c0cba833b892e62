"""Wave-29 extension specs: Poisson-bootstrap median CI (robust-stat
uncertainty), containment profile (asymmetric near-dup audit), and
session entry/exit matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup
from ..operators.bootstrap import _uniform_expr, _uniform_sql, _weight_cases
from ..registry import QuerySpec
from .data_pipeline import _SHINGLES_SQL

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


_REPL = 16


@_spec(
    "poisson_bootstrap_median_ci",
    f"""
    WITH fanned AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS v, t.r,
             CAST({_weight_cases(_uniform_sql('doc_id', 'r'))} AS BIGINT) AS w
      FROM documents, unnest(range(0, {_REPL})) AS t(r)
    ),
    nz AS (SELECT * FROM fanned WHERE w > 0),
    cum AS (
      SELECT r, v, w,
             SUM(w) OVER (PARTITION BY r ORDER BY v, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY r) AS tw
      FROM nz
    ),
    med AS (
      SELECT CAST(r AS INTEGER) AS replica, MIN(v) AS med
      FROM cum WHERE 2 * cw >= tw GROUP BY r
    )
    SELECT replica, CAST(med AS BIGINT) AS median_est FROM med
    """,
    "extension — Poisson-bootstrap MEDIAN: uncertainty for the robust "
    "statistic (operators/bootstrap.py weights + per-replica weighted "
    "median = first value whose cumulative weight crosses half). The "
    "mean CI (poisson_bootstrap_ci) needs only additive sums; the "
    "median needs an order statistic, so each replica runs a "
    "cumulative window — over rows that carried a nonzero weight "
    "only. At 100 TB swap the exact window for the mergeable KLL "
    "sketch per replica (operators/sketches.py) — same fan-out, "
    "bounded memory. The replica spread of median_est IS the CI",
)
def poisson_bootstrap_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = _uniform_expr("doc_id", "__r")
    fanned = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(_REPL - 1))).alias("__r"),
    ).withColumn("w", F.expr(_weight_cases(u)).cast("long"))
    nz = fanned.filter(F.col("w") > 0)
    w_cum = (
        Window.partitionBy("__r")
        .orderBy("v", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("__r")
    cum = nz.select(
        "__r",
        "v",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy(F.col("__r").cast("int").alias("replica"))
        .agg(F.min("v").alias("median_est"))
    )


_C_THRESH_BUCKETS = 10


@_spec(
    "containment_profile",
    f"""
    WITH sample AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % 5 = 0 AND doc_id < 1000 AND length(text) >= 3
    ),
    sh AS (SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM sample),
    pairs AS (
      SELECT a.doc_id,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(a.shingles) AS containment
      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    ),
    per_doc AS (
      SELECT doc_id, MAX(containment) AS maxc FROM pairs GROUP BY 1
    )
    SELECT CAST(LEAST(FLOOR(maxc * {_C_THRESH_BUCKETS}),
                      {_C_THRESH_BUCKETS - 1}) AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_ids
    FROM per_doc GROUP BY 1
    """,
    "training-data op — containment profile: per sampled document, the "
    "maximum DIRECTIONAL containment |A∩B|/|A| of its shingle set in "
    "any other document, bucketed into a histogram. Containment is the "
    "asymmetric cousin of Jaccard that catches quote-inclusion (a "
    "small doc embedded in a large one scores ~1.0 containment but "
    "low Jaccard — LSH-on-Jaccard misses it; Lee et al. dedup cares). "
    "All-pairs runs only on the fixed bounded sample (same cap as "
    "lsh_quality_report); the production path would LSH on the "
    "SMALLER set's signature",
)
def containment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(
        (F.col("doc_id") % 5 == 0)
        & (F.col("doc_id") < 1000)
        & (F.length("text") >= 3)
    )
    sh = sample.select(
        "doc_id", dedup.char_ngrams("text", 3).alias("sh")
    ).localCheckpoint(eager=False)
    a = sh.select(F.col("doc_id"), F.col("sh").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("doc_id") != F.col("b_id"))
        .select(
            "doc_id",
            (
                F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
                / F.size("a_sh")
            ).alias("containment"),
        )
    )
    per_doc = pairs.groupBy("doc_id").agg(F.max("containment").alias("maxc"))
    bucket = F.least(
        F.floor(F.col("maxc") * _C_THRESH_BUCKETS),
        F.lit(_C_THRESH_BUCKETS - 1),
    ).cast("int")
    return per_doc.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_ids"),
    )


_GAP_US = 1800 * 1_000_000


@_spec(
    "session_entry_exit_matrix",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
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
      SELECT *, CAST(SUM(new_session) OVER
                       (PARTITION BY user_id ORDER BY t_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM flagged
    ),
    ends AS (
      SELECT user_id, sid,
             MIN_BY(event_type, lpad(CAST(t_us AS VARCHAR), 20, '0') || ':'
                    || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS entry_type,
             MAX_BY(event_type, lpad(CAST(t_us AS VARCHAR), 20, '0') || ':'
                    || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS exit_type,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM ends GROUP BY 1, 2
    """,
    "extension — session entry/exit matrix (the bounce/landing "
    "analysis): which event type opens and which closes each "
    "session, aggregated to a type x type matrix. min_by/max_by over "
    "a zero-padded sortable (time:id) key picks the endpoints "
    "WITHOUT a second window pass (engines disagree on composite "
    "min_by keys, lexicographic padding is the portable spelling); "
    "sessionize + endpoints + matrix share one user_id shuffle",
)
def session_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        "event_type",
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
    sess = flagged.withColumn("sid", F.sum("new_session").over(wrun))
    key = F.concat(
        F.lpad(F.col("t_us").cast("string"), 20, "0"),
        F.lit(":"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    ends = sess.groupBy("user_id", "sid").agg(
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return ends.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
