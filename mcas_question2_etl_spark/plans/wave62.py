"""Wave-62 extension specs: content-defined chunk dedup, lag-1
two-regressor OLS (Granger-style), Brier decomposition, Cutler RSI,
split-conformal interval coverage.

Reference scope: beyond-reference analytics (SURVEY §2.13) + LLM-corpus
dedup (CDC chunking is the storage-systems dedup unit applied to
documents). The Granger spec closes the multivariate-OLS gap (the
regression family was single-feature); conformal closes the
uncertainty-quantification gap in the eval family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import chunking, evaluation, timeseries
from ..operators.ranking import with_global_row_number
from ..operators.sampling import hash_bucket, hash_bucket_sql
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "cdc_chunk_dedup",
    f"""
    WITH chunks AS ({chunking.cdc_chunks_sql("documents")}),
    keyed AS (
      SELECT d.source, md5(c.chunk_text) AS fp
      FROM chunks c JOIN documents d ON d.doc_id = c.doc_id
    ),
    counted AS (
      SELECT source, COUNT(*) OVER (PARTITION BY fp) AS occ FROM keyed
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           ROUND(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_frac
    FROM counted GROUP BY source
    """,
    "LLM-corpus dedup — content-defined chunking (LBFS rolling-"
    "boundary scheme, operators/chunking.py cdc_chunks): boundary "
    "tokens are content-addressed (md5 prefix), so edits shift no "
    "downstream chunk boundaries; per-source duplicated-chunk mass. "
    "The chunker is a narrow scan-stage projection; the only shuffle "
    "carries (source, 32-hex fp) rows, never chunk text.",
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunking.cdc_chunks(docs, "doc_id", "text")
    keyed = chunks.join(
        docs.select("doc_id", "source"), "doc_id"
    ).select("source", F.md5("chunk_text").alias("fp"))
    counted = keyed.select(
        "source", F.count(F.lit(1)).over(Window.partitionBy("fp")).alias("occ")
    )
    return counted.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum((F.col("occ") >= 2).cast("int")).cast("long").alias("n_dup_chunks"),
        F.round(
            F.sum((F.col("occ") >= 2).cast("int"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


# Closed-form 2-regressor OLS via centered normal equations (Cramer).
# Daily purchase count regressed on ITS OWN lag-1 and the lag-1 click
# count — the Granger-causality screen's unrestricted regression. All
# moments are exact-integer sums in double (daily counts ~1e4, 30-3000
# days: far inside 2^53), so both engines see bit-identical inputs to
# the final IEEE expressions.
_GRANGER_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS p,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS c
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT d2.p AS y, d1.p AS x1, d1.c AS x2
      FROM daily d1 JOIN daily d2 ON d2.day = d1.day + INTERVAL 1 DAY
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
             SUM(x1 * x1) AS s11, SUM(x2 * x2) AS s22,
             SUM(x1 * x2) AS s12, SUM(x1 * y) AS s1y,
             SUM(x2 * y) AS s2y, SUM(y * y) AS syy
      FROM pairs
    ),
    cen AS (
      SELECT n, s1, s2, sy,
             s11 - s1 * s1 / n AS m11,
             s22 - s2 * s2 / n AS m22,
             s12 - s1 * s2 / n AS m12,
             s1y - s1 * sy / n AS v1,
             s2y - s2 * sy / n AS v2,
             syy - sy * sy / n AS tss
      FROM m
    ),
    fit AS (
      SELECT n, s1, s2, sy, tss, v1, v2,
             (v1 * m22 - v2 * m12) / (m11 * m22 - m12 * m12) AS b1,
             (m11 * v2 - m12 * v1) / (m11 * m22 - m12 * m12) AS b2
      FROM cen
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((sy - b1 * s1 - b2 * s2) / n, 6) AS b0,
           ROUND(b1, 6) AS b1,
           ROUND(b2, 6) AS b2,
           ROUND((b1 * v1 + b2 * v2) / tss, 6) AS r2
    FROM fit
    """


@_spec(
    "granger_lag_regression",
    _GRANGER_SQL,
    "regression op — two-regressor closed-form OLS (centered normal "
    "equations, Cramer solve): daily purchases on lag-1 purchases + "
    "lag-1 clicks, the Granger screen's unrestricted model. One day "
    "groupBy reduces events, one calendar self-join builds lag pairs "
    "(no density assumption), one aggregate carries all ten exact "
    "moments; the solve is a 1-row projection.",
)
def granger_lag_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("double")
        .alias("p"),
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("double")
        .alias("c"),
    )
    d1 = daily.select(
        F.date_add("day", 1).alias("day"),
        F.col("p").alias("x1"),
        F.col("c").alias("x2"),
    )
    pairs = daily.select("day", F.col("p").alias("y")).join(d1, "day")
    m = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cen = m.select(
        "n",
        "s1",
        "s2",
        "sy",
        (F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("m11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("m22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("m12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")).alias("v1"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")).alias("v2"),
        (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")).alias("tss"),
    )
    det = F.col("m11") * F.col("m22") - F.col("m12") * F.col("m12")
    fit = cen.select(
        "n",
        "s1",
        "s2",
        "sy",
        "tss",
        "v1",
        "v2",
        ((F.col("v1") * F.col("m22") - F.col("v2") * F.col("m12")) / det).alias("b1"),
        ((F.col("m11") * F.col("v2") - F.col("m12") * F.col("v1")) / det).alias("b2"),
    )
    return fit.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.col("sy") - F.col("b1") * F.col("s1") - F.col("b2") * F.col("s2"))
            / F.col("n"),
            6,
        ).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
        F.round((F.col("b1") * F.col("v1") + F.col("b2") * F.col("v2")) / F.col("tss"), 6).alias(
            "r2"
        ),
    )


_BRIER_TRAIN_SQL = f"""
    SELECT n_chars // 100 AS len_bin, lang = 'en' AS is_en
    FROM documents WHERE {hash_bucket_sql("doc_id", 2)} = 0
"""
_BRIER_TEST_SQL = f"""
    SELECT n_chars // 100 AS len_bin, lang = 'en' AS is_en
    FROM documents WHERE {hash_bucket_sql("doc_id", 2)} = 1
"""


@_spec(
    "brier_decomposition_langid",
    evaluation.brier_decomposition_sql(
        _BRIER_TRAIN_SQL, _BRIER_TEST_SQL, "len_bin", "is_en"
    ),
    "eval op — Brier score + exact Murphy decomposition "
    "(reliability - resolution + uncertainty) of the histogram "
    "calibrator 'P(en | length bin) from the train split' on the "
    "held-out split (operators/evaluation.py brier_decomposition): "
    "per-bin integer counts, one broadcast of the tiny bin table; "
    "the hash split reuses the no-RNG sampling discipline.",
)
def brier_decomposition_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("n_chars") / 100).cast("long").alias("len_bin"),
        (F.col("lang") == "en").alias("is_en"),
        hash_bucket("doc_id", 2).alias("__fold"),
    )
    train = docs.filter(F.col("__fold") == 0)
    test = docs.filter(F.col("__fold") == 1)
    return evaluation.brier_decomposition(train, test, "len_bin", "is_en")


@_spec(
    "rsi_cutler_daily",
    timeseries.rsi_cutler_sql("events", "ts", "value"),
    "time-series op — RSI (Cutler SMA form) over the daily total "
    "event value: trailing 14-delta gain/loss averages, conventional "
    "0/100 limits at all-loss/all-gain windows, full windows only; "
    "runs over the bounded daily series.",
)
def rsi_cutler_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return timeseries.rsi_cutler(ev, "ts", "value")


@_spec(
    "conformal_interval_coverage",
    f"""
    WITH folded AS (
      SELECT o_orderpriority AS prio, o_totalprice AS price,
             o_orderkey, {hash_bucket_sql("o_orderkey", 3)} AS fold
      FROM orders
    ),
    model AS (
      SELECT prio,
             CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS mu
      FROM folded WHERE fold = 0 GROUP BY prio
    ),
    calib AS (
      SELECT ABS(f.price - m.mu) AS r, f.o_orderkey
      FROM folded f JOIN model m ON m.prio = f.prio
      WHERE f.fold = 1
    ),
    nk AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_calib,
             (9 * (COUNT(*) + 1) + 9) // 10 AS k
      FROM calib
    ),
    ranked AS (
      SELECT r, ROW_NUMBER() OVER (ORDER BY r, o_orderkey) AS rnk FROM calib
    ),
    q AS (SELECT ranked.r AS q FROM ranked, nk WHERE ranked.rnk = nk.k),
    test AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN ABS(f.price - m.mu) <= q.q
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM folded f JOIN model m ON m.prio = f.prio CROSS JOIN q
      WHERE f.fold = 2
    )
    SELECT nk.n_calib, CAST(nk.k AS BIGINT) AS k_rank,
           ROUND(q.q, 4) AS q_hat,
           test.n_test,
           ROUND(test.n_covered / CAST(test.n_test AS DOUBLE), 6) AS coverage
    FROM nk, q, test
    """,
    "eval op — split-conformal prediction intervals (Vovk; Lei et "
    "al. 2018) around the per-priority mean-price model: exact "
    "ceil(0.9(n+1))-th order statistic of calibration residuals via "
    "integer-only rank math and the two-phase distributed row number "
    "(no single-task sort); held-out coverage then is one broadcast "
    "scalar + one aggregate. The DECIMAL-exact model means make "
    "residuals bit-identical across engines, so the order statistic "
    "is engine-stable.",
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    folded = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("price"),
        "o_orderkey",
        hash_bucket("o_orderkey", 3).alias("fold"),
    )
    model = (
        folded.filter(F.col("fold") == 0)
        .groupBy("prio")
        .agg(
            (
                F.sum(F.col("price").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mu")
        )
    )
    calib = (
        folded.filter(F.col("fold") == 1)
        .join(F.broadcast(model), "prio")
        .select(F.abs(F.col("price") - F.col("mu")).alias("r"), "o_orderkey")
    )
    nk = calib.agg(
        F.count(F.lit(1)).cast("long").alias("n_calib"),
        F.expr("(9 * (count(1) + 1) + 9) div 10").cast("long").alias("k"),
    )
    ranked = with_global_row_number(calib, [F.col("r"), F.col("o_orderkey")], "rnk")
    q = (
        ranked.crossJoin(F.broadcast(nk))
        .filter(F.col("rnk") == F.col("k"))
        .select(F.col("r").alias("q"))
    )
    test = (
        folded.filter(F.col("fold") == 2)
        .join(F.broadcast(model), "prio")
        .crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                (F.abs(F.col("price") - F.col("mu")) <= F.col("q")).cast("int")
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        nk.crossJoin(q)
        .crossJoin(test)
        .select(
            "n_calib",
            F.col("k").alias("k_rank"),
            F.round("q", 4).alias("q_hat"),
            "n_test",
            F.round(F.col("n_covered") / F.col("n_test").cast("double"), 6).alias(
                "coverage"
            ),
        )
    )
