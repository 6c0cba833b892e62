"""Multimodal column plumbing: opaque binary payloads (image/audio/
video) with typed metadata, processed by Arrow-batched pandas
iterators.

The Spark-side contract is fully real — schemas, partition sizing, UDF
signatures, batch shapes, and the mapInPandas pipeline are what a
production multimodal pipeline runs; only the codec kernels are
pluggable because no image/audio libraries ship in this container:

  * ``decoder=None`` -> DETERMINISTIC FAKE (metadata derived from the
    bytes themselves: length, checksum, synthesized dimensions) so the
    distributed plumbing is testable end-to-end;
  * a real kernel (PIL/libav via ``decoder=callable``) slots into the
    same signature;
  * ``strict_decoder()`` is the clearly-marked NotImplementedError stub
    to fail loudly where fake features must not leak into production.

Scale notes: binary payloads dominate row width, so operators here
never shuffle raw bytes — derived features are projected out and the
payload column dropped as early as possible; ``maxRecordsPerBatch``
bounds Arrow batch memory (payloads × batch size is the real memory
unit, not row count).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal column bundle: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic fake codec: features derived only from the bytes,
    so results are reproducible and assert-able without real media
    libraries. Width/height/duration are synthesized from the checksum."""
    if payload is None:
        return {"n_bytes": 0, "checksum": None, "width": None, "height": None, "duration_ms": None}
    h = hashlib.md5(payload).hexdigest()
    seed = int(h[:8], 16)
    out = {
        "n_bytes": len(payload),
        "checksum": h,
        "width": None,
        "height": None,
        "duration_ms": None,
    }
    if media_type == "image":
        out["width"] = 64 + seed % 1920
        out["height"] = 64 + (seed >> 8) % 1080
    elif media_type in ("audio", "video"):
        out["duration_ms"] = 1000 + seed % 600_000
        if media_type == "video":
            out["width"] = 320 + seed % 1600
            out["height"] = 240 + (seed >> 8) % 840
    return out


def strict_decoder(payload: bytes, media_type: str) -> dict:
    """The production decode kernel slot. Intentionally unimplemented in
    this container (no PIL/libav/ffmpeg): callers opting out of the fake
    must supply a real kernel."""
    raise NotImplementedError(
        "real media decoding requires image/audio codecs not present in "
        "this environment; pass decoder=<your kernel> (same signature) "
        "or use the deterministic fake_decode"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], dict] | None = None,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow-batched, one
    Python worker pass, payload column dropped on output."""
    import pandas as pd

    decode = decoder or fake_decode

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                decode(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plumbing for video: one output row per sampled
    frame offset. The frame *extraction* is the pluggable kernel (fake:
    frame checksum = payload checksum salted by offset); the row
    explosion, offset arithmetic, and schema are the real pipeline."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("offset_ms", T.LongType()),
            T.StructField("frame_checksum", T.StringType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "video" or payload is None:
                    continue
                dur = fake_decode(payload, "video")["duration_ms"]
                n = min(max_frames, max(1, dur // every_ms))
                for i in range(int(n)):
                    off = i * every_ms
                    salt = f"{mid}:{off}".encode()
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": i,
                            "offset_ms": off,
                            "frame_checksum": format(
                                zlib.crc32(payload + salt), "08x"
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return media.mapInPandas(run, schema=schema)


#: 8x8 grayscale thumbnail: the canonical perceptual-hash input
PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def fake_thumbnail(payload: bytes) -> list[int]:
    """Deterministic fake thumbnail kernel: 64 4-bit 'pixels' from the
    md5 keystream of the payload (two salted digests -> 64 hex nibbles).
    A real kernel (PIL resize->grayscale->8x8) slots into the same
    signature; everything downstream (perceptual hash, banding, verify)
    is kernel-agnostic."""
    hx = (
        hashlib.md5(payload + b":0").hexdigest()
        + hashlib.md5(payload + b":1").hexdigest()
    )
    return [int(c, 16) for c in hx]


def decode_thumbnails(
    media: DataFrame,
    kernel: Callable[[bytes], list[int]] | None = None,
    media_type: str = "image",
) -> DataFrame:
    """payload -> 64 decoded samples via Arrow-batched mapInPandas
    (rows of ``media_type`` only; payload dropped on output so raw
    bytes never travel past the decode stage). For images the fake
    kernel yields an 8x8 grayscale thumbnail; the same plumbing
    serves audio by treating the 64 nibbles as an energy envelope
    (see plans/wave31.py) — a real kernel (PIL resize / RMS frames)
    slots into the same signature either way."""
    import pandas as pd

    k = kernel or fake_thumbnail

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            sub = pdf[pdf["media_type"] == media_type]
            if sub.empty:
                continue  # an empty frame would type pixels as float64
            yield pd.DataFrame(
                {
                    "media_id": sub["media_id"].values,
                    "media_type": sub["media_type"].values,
                    "pixels": pd.Series(
                        [k(p) for p in sub["payload"]], dtype=object
                    ).values,
                }
            )

    return media.mapInPandas(run, schema=PIXEL_SCHEMA)


def ahash_words(pixels_col: str) -> tuple[F.Column, F.Column]:
    """Average-hash (aHash) of a 64-pixel thumbnail as two 32-bit
    words: bit i set iff pixel i exceeds the thumbnail mean. Pure
    codegen expressions — the hash costs no Python once pixels exist."""
    mean = f"(aggregate({pixels_col}, 0L, (a, x) -> a + x) / 64.0)"

    def word(offset: int) -> F.Column:
        return F.expr(
            f"aggregate(transform(slice({pixels_col}, {offset + 1}, 32), "
            f"(x, i) -> if(cast(x as double) > {mean}, shiftleft(1L, i), 0L)), "
            "0L, (a, x) -> a + x)"
        )

    return word(0), word(32)


def ahash_words_sql(pixels: str) -> tuple[str, str]:
    """DuckDB twin of :func:`ahash_words` (1-indexed lists)."""
    mean = f"(list_sum({pixels}) / 64.0)"

    def word(offset: int) -> str:
        return (
            f"CAST(list_sum([CASE WHEN CAST({pixels}[i + {offset}] AS DOUBLE) > {mean} "
            f"THEN 1::BIGINT << (i - 1) ELSE 0 END "
            f"for i in range(1, 33)]) AS BIGINT)"
        )

    return word(0), word(32)
