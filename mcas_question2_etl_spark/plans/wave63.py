"""Wave-63 extension specs: product-quantization ANN, SPRT sequential
conversion monitor, reciprocal-rank fusion, day-of-week seasonal
decomposition, Hurst R/S long-memory exponent.

Reference scope: beyond-reference analytics (SURVEY §2.13). PQ
completes the ANN serving family (operators/pq.py); SPRT adds the
sequential-testing shape (exact integer prefix counts times two fixed
log-likelihood constants — engine-exact by construction); RRF is the
standard multi-ranker retrieval combiner; the decomposition and Hurst
specs extend the time-series family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import pq
from ..operators.ranking import with_global_row_number, with_running_sum
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


@_spec(
    "pq_ann_topk",
    pq.pq_topk_sql(),
    "ANN op — product quantization (Jegou et al. 2011, "
    "operators/pq.py): 4 subspace Lloyd codebooks (Q20 integer "
    "k-means, deterministic seed), 3-bit codes per subspace, "
    "asymmetric-distance top-10 via a broadcast m*k lookup table; "
    "the corpus scan reads codes, never vectors.",
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return pq.pq_topk(emb)


# SPRT constants: H0 conversion p0=0.15 vs H1 p1=0.20, alpha=beta=0.05.
# The increments multiply EXACT integer prefix counts, so both engines
# compute bit-identical llr values from the same two double constants.
_L1 = math.log(0.20 / 0.15)  # success increment
_L0 = math.log(0.80 / 0.85)  # failure increment
_A = math.log(0.95 / 0.05)  # upper boundary -> reject H0
_B = math.log(0.05 / 0.95)  # lower boundary -> accept H0


@_spec(
    "sprt_conversion_monitor",
    f"""
    WITH scored AS (
      SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
               AS cumx
      FROM events
    ),
    llrd AS (
      SELECT n,
             cumx * CAST({_L1!r} AS DOUBLE)
               + (n - cumx) * CAST({_L0!r} AS DOUBLE) AS llr
      FROM scored
    ),
    crossed AS (
      SELECT 0 AS prio, n, llr,
             CASE WHEN llr >= {_A!r} THEN 'reject_h0'
                  ELSE 'accept_h0' END AS decision
      FROM llrd WHERE llr >= {_A!r} OR llr <= {_B!r}
      ORDER BY n LIMIT 1
    ),
    tail AS (
      SELECT 1 AS prio, n, llr, 'continue' AS decision
      FROM llrd ORDER BY n DESC LIMIT 1
    )
    SELECT decision, CAST(n AS BIGINT) AS n_decide,
           ROUND(llr, 6) AS llr_at
    FROM (SELECT * FROM crossed UNION ALL SELECT * FROM tail)
    ORDER BY prio LIMIT 1
    """,
    "sequential-testing op — Wald SPRT over the event stream "
    "(purchase-rate H0 0.15 vs H1 0.20, alpha=beta=0.05): the "
    "log-likelihood ratio is cumx*L1 + (n-cumx)*L0 over EXACT "
    "integer prefix counts from the two-phase distributed rank/scan "
    "(operators/ranking.py — no single-task window), so the first "
    "boundary crossing is engine-exact; returns the decision row.",
)
def sprt_conversion_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("x"),
    )
    ranked = with_global_row_number(ev, [F.col("ts"), F.col("event_id")], "n")
    scanned = with_running_sum(
        ranked, [F.col("ts"), F.col("event_id")], "x", "cumx"
    )
    llr = (F.col("cumx") * _L1 + (F.col("n") - F.col("cumx")) * _L0).alias(
        "llr"
    )
    llrd = scanned.select("n", llr)
    crossed = (
        llrd.filter((F.col("llr") >= _A) | (F.col("llr") <= _B))
        .orderBy("n")
        .limit(1)
        .select(
            F.lit(0).alias("prio"),
            "n",
            "llr",
            F.when(F.col("llr") >= _A, "reject_h0")
            .otherwise("accept_h0")
            .alias("decision"),
        )
    )
    tail = (
        llrd.orderBy(F.col("n").desc())
        .limit(1)
        .select(
            F.lit(1).alias("prio"), "n", "llr", F.lit("continue").alias("decision")
        )
    )
    return (
        crossed.unionByName(tail)
        .orderBy("prio")
        .limit(1)
        .select(
            "decision",
            F.col("n").cast("bigint").alias("n_decide"),
            F.round("llr", 6).alias("llr_at"),
        )
    )


@_spec(
    "rrf_fusion_topk",
    """
    WITH ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r1,
             ROW_NUMBER() OVER (ORDER BY len(string_split(text, ' ')) DESC,
                                doc_id) AS r2
      FROM documents
    )
    SELECT doc_id, CAST(r1 AS BIGINT) AS r1, CAST(r2 AS BIGINT) AS r2,
           ROUND(1.0 / (60 + r1) + 1.0 / (60 + r2), 6) AS rrf
    FROM ranked
    ORDER BY 1.0 / (60 + r1) + 1.0 / (60 + r2) DESC, doc_id
    LIMIT 20
    """,
    "retrieval op — reciprocal rank fusion (Cormack et al. 2009, "
    "k=60) of two document rankings (by chars, by tokens): both "
    "global ranks use the two-phase range-partitioned row number; "
    "fusion is a narrow projection and the top-20 is TakeOrdered.",
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).alias("__ntok"),
    )
    ranked = with_global_row_number(
        docs, [F.col("n_chars").desc(), F.col("doc_id")], "r1"
    )
    ranked = with_global_row_number(
        ranked, [F.col("__ntok").desc(), F.col("doc_id")], "r2"
    )
    rrf = 1.0 / (F.lit(60) + F.col("r1")) + 1.0 / (F.lit(60) + F.col("r2"))
    return (
        ranked.select(
            "doc_id",
            F.col("r1").cast("bigint").alias("r1"),
            F.col("r2").cast("bigint").alias("r2"),
            F.round(rrf, 6).alias("rrf"),
            rrf.alias("__key"),
        )
        .orderBy(F.col("__key").desc(), "doc_id")
        .limit(20)
        .drop("__key")
    )


@_spec(
    "seasonal_dow_decompose",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS di,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT di, x,
             AVG(x) OVER w AS trend,
             COUNT(*) OVER w AS nw
      FROM daily
      WINDOW w AS (ORDER BY di ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT CAST(di % 7 AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(x - trend), 4) AS seasonal
    FROM trended WHERE nw = 7
    GROUP BY di % 7
    """,
    "time-series op — classical additive seasonal decomposition at "
    "the day-of-week period: centered 7-row moving-average trend "
    "(full windows only), per-weekday mean of the detrended series. "
    "The weekday key is epoch-day mod 7 (engine-neutral, unlike "
    "dayofweek()'s differing conventions); the window runs over the "
    "bounded daily series.",
)
def seasonal_dow_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("di")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w = Window.orderBy("di").rowsBetween(-3, 3)
    trended = daily.select(
        "di",
        "x",
        F.avg("x").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("nw"),
    ).filter(F.col("nw") == 7)
    return trended.groupBy((F.col("di") % 7).cast("bigint").alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg(F.col("x") - F.col("trend")), 4).alias("seasonal"),
    )


_HURST_NS = (8, 16, 32)


def _hurst_rs_block_sql(n: int) -> str:
    return f"""
      SELECT CAST({n} AS BIGINT) AS block_n, bid, MAX(cum) - MIN(cum) AS r,
             SQRT(SUM(dev * dev) / {n}) AS s
      FROM (
        SELECT bid, dev,
               SUM(dev) OVER (PARTITION BY bid ORDER BY di
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM (
          SELECT di, di // {n} AS bid,
                 x - SUM(x) OVER (PARTITION BY di // {n}) / {n} AS dev,
                 COUNT(*) OVER (PARTITION BY di // {n}) AS bn
          FROM daily
        ) WHERE bn = {n}
      ) GROUP BY bid
    """


@_spec(
    "hurst_rs_daily",
    f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS di,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1
    ),
    blocks AS ({" UNION ALL ".join(_hurst_rs_block_sql(n) for n in _HURST_NS)}),
    per_n AS (
      SELECT block_n, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             AVG(r / s) AS mean_rs
      FROM blocks WHERE s > 0 GROUP BY block_n
    ),
    fit AS (
      SELECT (COUNT(*) * SUM(ln(CAST(block_n AS DOUBLE)) * ln(mean_rs))
              - SUM(ln(CAST(block_n AS DOUBLE))) * SUM(ln(mean_rs)))
             / (COUNT(*) * SUM(ln(CAST(block_n AS DOUBLE))
                               * ln(CAST(block_n AS DOUBLE)))
                - SUM(ln(CAST(block_n AS DOUBLE)))
                  * SUM(ln(CAST(block_n AS DOUBLE)))) AS h
      FROM per_n
    )
    SELECT block_n, n_blocks, ROUND(mean_rs, 4) AS mean_rs,
           ROUND(fit.h, 4) AS hurst
    FROM per_n CROSS JOIN fit
    """,
    "time-series op — Hurst exponent by rescaled-range analysis "
    "(Hurst 1951; Mandelbrot & Wallis 1969): full epoch-aligned "
    "blocks of 8/16/32 days, per-block R (range of the centered "
    "prefix sum, sequential within a block so engine-exact) over S "
    "(population sigma), log-log OLS slope across the three scales. "
    "Blocks aggregate in one shuffle on (scale, block).",
)
def hurst_rs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("di")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    per_n_parts = []
    for n in _HURST_NS:
        wb = Window.partitionBy("bid")
        blocked = daily.select(
            "di", "x", (F.col("di") / n).cast("long").alias("bid")
        ).select(
            "di",
            "bid",
            (F.col("x") - F.sum("x").over(wb) / n).alias("dev"),
            F.count(F.lit(1)).over(wb).alias("bn"),
        ).filter(F.col("bn") == n)
        wc = (
            Window.partitionBy("bid")
            .orderBy("di")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = blocked.select(
            "bid", "dev", F.sum("dev").over(wc).alias("cum")
        )
        rs = cum.groupBy("bid").agg(
            (F.max("cum") - F.min("cum")).alias("r"),
            F.sqrt(F.sum(F.col("dev") * F.col("dev")) / n).alias("s"),
        )
        per_n_parts.append(
            rs.filter(F.col("s") > 0).agg(
                F.lit(n).cast("bigint").alias("block_n"),
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                F.avg(F.col("r") / F.col("s")).alias("mean_rs"),
            )
        )
    from functools import reduce

    # scales with zero full blocks (short series) drop out, matching
    # the oracle's GROUP BY which never emits an empty group
    per_n = reduce(DataFrame.unionByName, per_n_parts).filter(
        F.col("n_blocks") > 0
    )
    lx = F.log(F.col("block_n").cast("double"))
    ly = F.log("mean_rs")
    fit = per_n.agg(
        (
            (F.count(F.lit(1)) * F.sum(lx * ly) - F.sum(lx) * F.sum(ly))
            / (F.count(F.lit(1)) * F.sum(lx * lx) - F.sum(lx) * F.sum(lx))
        ).alias("h")
    )
    return per_n.crossJoin(F.broadcast(fit)).select(
        "block_n",
        "n_blocks",
        F.round("mean_rs", 4).alias("mean_rs"),
        F.round("h", 4).alias("hurst"),
    )
