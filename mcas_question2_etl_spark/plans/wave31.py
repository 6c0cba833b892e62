"""Wave-31 extension spec: audio VAD-style active-segment extraction —
the audio-side multimodal composition (decode kernel -> threshold ->
interval coalescing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.intervals import coalesce_intervals
from ..operators.multimodal import decode_thumbnails
from ..registry import QuerySpec

SPECS: list[QuerySpec] = []


def _spec(name: str, oracle: str | None, survey_ref: str):
    def wrap(fn):
        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle, survey_ref=survey_ref))
        return fn

    return wrap


#: frames with energy >= threshold are "speech"
_ENERGY_T = 8


@_spec(
    "audio_active_segments",
    f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             md5(text || ':0') || md5(text || ':1') AS hx
      FROM documents
    ),
    frames AS (
      SELECT media_id, i - 1 AS frame,
             CAST(('0x' || substring(hx, i, 1)) AS INTEGER) AS energy
      FROM media, unnest(range(1, 65)) AS t(i)
    ),
    active AS (
      SELECT media_id, frame AS s, frame + 1 AS e
      FROM frames WHERE energy >= {_ENERGY_T}
    ),
    flagged AS (
      SELECT media_id, s, e,
             MAX(e) OVER (PARTITION BY media_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM active
    ),
    grouped AS (
      SELECT media_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY media_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS period_id
      FROM flagged
    ),
    segs AS (
      SELECT media_id, period_id, MIN(s) AS seg_start, MAX(e) AS seg_end
      FROM grouped GROUP BY 1, 2
    )
    SELECT media_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(seg_end - seg_start) AS BIGINT) AS active_frames,
           CAST(MAX(seg_end - seg_start) AS BIGINT) AS longest_segment
    FROM segs GROUP BY 1
    """,
    "multimodal (audio) — VAD-style active-segment extraction: the "
    "deterministic fake energy envelope (64 frames from the payload's "
    "md5 keystream — a real RMS-frame kernel slots into the same "
    "decode_thumbnails plumbing) is thresholded into active frames "
    "and coalesced into speech segments with the SAME interval-union "
    "operator the session analytics use (operators/intervals.py "
    "coalesce_intervals) — modality-agnostic composition. Per-media "
    "windows ride one media_id shuffle; payloads never leave the "
    "decode stage",
)
def audio_active_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    env = decode_thumbnails(media, media_type="audio").withColumnRenamed(
        "pixels", "energy"
    )
    frames = env.select(
        "media_id",
        F.posexplode("energy").alias("frame", "e"),
    )
    active = frames.filter(F.col("e") >= _ENERGY_T).select(
        "media_id",
        F.col("frame").cast("long").alias("s"),
        (F.col("frame") + 1).cast("long").alias("e"),
    )
    segs = coalesce_intervals(active, ["media_id"], "s", "e")
    return segs.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("period_end") - F.col("period_start")).alias("active_frames"),
        F.max(F.col("period_end") - F.col("period_start")).alias("longest_segment"),
    )
