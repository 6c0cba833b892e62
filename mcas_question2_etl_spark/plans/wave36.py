"""Wave-36 extension specs: in-place within-document token dedup
(order-preserving boilerplate removal) and an autocorrelation /
seasonality report.
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


@_spec(
    "inplace_token_dedup",
    """
    WITH toked AS (
      SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents
    ),
    dedup AS (
      SELECT doc_id, source, len(ts) AS n_before,
             len([ts[i] for i in range(1, len(ts) + 1)
                  IF list_position(ts, ts[i]) = i]) AS n_after
      FROM toked
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_before) AS BIGINT) AS tokens_before,
           CAST(SUM(n_after) AS BIGINT) AS tokens_after,
           CAST(SUM(n_before - n_after) AS BIGINT) AS tokens_removed
    FROM dedup GROUP BY 1
    """,
    "training-data op — in-place within-document dedup: drop every "
    "repeated token occurrence while PRESERVING first-occurrence "
    "order (array_distinct guarantees no order; the keep-if-first "
    "filter does — the same primitive removes repeated boilerplate "
    "lines/sentences in place when fed line arrays). Pure array "
    "expressions in the scan stage (keep test = list_position == "
    "own index), one source-keyed aggregation for the removal "
    "accounting. Complements the Gopher repetition FILTERS (which "
    "drop whole docs) with the repair that keeps them",
)
def inplace_token_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "source", F.split("text", " ").alias("ts"))
    kept = F.expr(
        "size(filter(ts, (t, i) -> array_position(ts, t) = i + 1))"
    )
    dedup = toked.select(
        "source",
        F.size("ts").alias("n_before"),
        kept.alias("n_after"),
    )
    return dedup.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_before").cast("long").alias("tokens_before"),
        F.sum("n_after").cast("long").alias("tokens_after"),
        F.sum(F.col("n_before") - F.col("n_after")).cast("long").alias(
            "tokens_removed"
        ),
    )


_AC_LAGS = (1, 2, 3, 7)


@_spec(
    "autocorrelation_report",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type, l.lag, a.c AS vx, b.c AS vy
      FROM (SELECT unnest([{", ".join(map(str, _AC_LAGS))}]) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + l.lag
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           (COUNT(*) * SUM(vx * vy) - SUM(vx) * SUM(vy))
             / sqrt((COUNT(*) * SUM(vx * vx) - SUM(vx) * SUM(vx))
                    * (COUNT(*) * SUM(vy * vy) - SUM(vy) * SUM(vy))) AS acf
    FROM pairs GROUP BY 1, 2
    """,
    "extension — autocorrelation report: per event type, Pearson "
    "autocorrelation of the daily series at lags 1/2/3/7 — the "
    "seasonality detector (a lag-7 spike = weekly cycle) that decides "
    "whether anomaly baselines (anomaly_days_zscore) need day-of-week "
    "adjustment. Same five-raw-moments shape as "
    "lagged_cross_correlation, per (type, lag) over the tiny daily "
    "rollup; events scan once",
)
def autocorrelation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            "event_type",
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=False)
    )
    lags = spark.createDataFrame([(l,) for l in _AC_LAGS], "lag int")
    a = daily.select("event_type", "day", F.col("c").alias("vx"))
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("c").alias("vy"),
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("et2") == F.col("event_type"))
            & (F.col("day2") == F.col("day") + F.col("lag")),
        )
    )
    n = F.count(F.lit(1))
    num = n * F.sum(F.col("vx") * F.col("vy")) - F.sum("vx") * F.sum("vy")
    den = F.sqrt(
        (n * F.sum(F.col("vx") * F.col("vx")) - F.sum("vx") * F.sum("vx"))
        * (n * F.sum(F.col("vy") * F.col("vy")) - F.sum("vy") * F.sum("vy"))
    )
    return pairs.groupBy("event_type", "lag").agg(
        n.cast("long").alias("n_days"), (num / den).alias("acf")
    )
