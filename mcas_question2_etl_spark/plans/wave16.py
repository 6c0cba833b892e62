"""Wave-16 extension specs: perceptual-hash image near-dup (aHash +
hamming-band LSH over the multimodal decode plumbing), SFT-style
conversation assembly from event streams, and exact dyadic EWMA
smoothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import timeseries
from ..operators.dedup import hamming_band_pairs
from ..operators.multimodal import ahash_words, ahash_words_sql, decode_thumbnails
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


# --------------------------------------------------------------------------
# perceptual-hash near-dup: groups of 5 docs share a base payload, each
# member's thumbnail gets one deterministic pixel perturbation -> planted
# near-duplicate images with hamming-close aHashes
# --------------------------------------------------------------------------

#: JVM-side perturbation on the decoded pixels (kernel stays a pure
#: function of the payload): pixel (media_id % 64) shifts by media_id % 7
_PERTURB = (
    "transform(pixels, (x, i) -> if(i = cast(media_id % 64 as int), "
    "cast((x + media_id % 7) % 16 as int), x))"
)

_ORACLE_W1, _ORACLE_W2 = ahash_words_sql("pixels")

_PHASH_ORACLE = f"""
    WITH base AS (
      SELECT d.doc_id AS media_id, b.text AS btext
      FROM documents d JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 5
    ),
    hexes AS (
      SELECT media_id,
             md5(btext || ':0') || md5(btext || ':1') AS hx
      FROM base
    ),
    px AS (
      SELECT media_id,
             [CASE WHEN (i - 1) = media_id % 64
                   THEN CAST((CAST(('0x' || substring(hx, i, 1)) AS INTEGER)
                              + media_id % 7) % 16 AS INTEGER)
                   ELSE CAST(('0x' || substring(hx, i, 1)) AS INTEGER) END
              for i in range(1, 65)] AS pixels
      FROM hexes
    ),
    hashed AS (
      SELECT media_id, {_ORACLE_W1} AS h1, {_ORACLE_W2} AS h2 FROM px
    ),
    pairs AS (
      SELECT a.media_id AS a_id, b.media_id AS b_id,
             CAST(bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
                  AS INTEGER) AS hamming
      FROM hashed a JOIN hashed b ON a.media_id < b.media_id
    )
    SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 3
"""


@_spec(
    "phash_image_neardup",
    _PHASH_ORACLE,
    "extension — perceptual-hash image near-dup: the pHash dedup "
    "pipeline for image corpora. Thumbnails decode via the Arrow "
    "mapInPandas kernel (operators/multimodal.py decode_thumbnails — "
    "fake 8x8 kernel, real PIL kernel slots in), aHash is a pure "
    "codegen expression (ahash_words), and pairing is hamming-band "
    "LSH (operators/dedup.py hamming_band_pairs): 4x16-bit bands "
    "guarantee recall for hamming <= 3 by pigeonhole, exact "
    "bit_count(xor) verify kills false positives. The oracle is the "
    "brute-force all-pairs scan over the SAME hashes — equality "
    "proves the banding lossless. Planted near-dups: payload groups "
    "of 5 with one deterministic pixel perturbation each",
)
def phash_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") - F.col("doc_id") % 5).alias("base_id"),
    ).join(
        docs.select(F.col("doc_id").alias("base_id"), F.col("text").alias("btext")),
        "base_id",
    )
    media = base.select(
        "media_id",
        F.lit("image").alias("media_type"),
        F.encode("btext", "UTF-8").alias("payload"),
    )
    thumbs = decode_thumbnails(media).withColumn("pixels", F.expr(_PERTURB))
    h1, h2 = ahash_words("pixels")
    hashed = thumbs.select("media_id", h1.alias("h1"), h2.alias("h2"))
    return hamming_band_pairs(
        hashed, "media_id", ["h1", "h2"], max_hamming=3, band_bits=16
    )


# --------------------------------------------------------------------------
# SFT conversation assembly: session -> ordered turn transcript
# --------------------------------------------------------------------------

_GAP_US = 1800 * 1_000_000


@_spec(
    "sft_conversation_render",
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
    )
    SELECT user_id, sid,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           string_agg(event_type, ' -> ' ORDER BY t_us, event_id) AS transcript
    FROM sess GROUP BY user_id, sid
    """,
    "extension — SFT/dialog assembly: event streams become ordered "
    "per-session transcripts (the conversation-threading step of a "
    "fine-tuning data pipeline). Sessionize shares ONE user_id "
    "shuffle with the assembly aggregation; the transcript is a "
    "deterministic sorted collect_list fold, never a driver loop. "
    "Template rendering is a string expression — swap in any chat "
    "format at the same spot",
)
def sft_conversation_render(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list("
                "struct(t_us, event_id, event_type))), x -> x.event_type)"
            ),
            " -> ",
        ).alias("transcript"),
    )


# --------------------------------------------------------------------------
# exact dyadic EWMA smoothing over the daily series
# --------------------------------------------------------------------------


@_spec(
    "ewma_daily_smoothing",
    timeseries.ewma_half_sql(
        """(SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2)""",
        "event_type",
        "day",
        "n_events",
    ),
    "extension — EWMA trend smoothing (operators/timeseries.py "
    "ewma_half): the recursive filter unrolled to ONE window prefix "
    "sum via the dyadic-alpha trick (alpha=1/2 makes every term an "
    "integer times a power of two, so doubles are exact and "
    "partition-order-independent — no iteration, no UDF, no float "
    "drift between engines). Input is the per-day rollup, so the "
    "window runs over days, never events",
)
def ewma_daily_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    out = timeseries.ewma_half(daily, ["event_type"], "day", "n_events")
    return out.select("event_type", "day", "n_events", "ewma")
