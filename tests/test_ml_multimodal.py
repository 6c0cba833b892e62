"""GLM layer + multimodal plumbing tests."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from mcas_question2_etl_spark.ml import glm
from mcas_question2_etl_spark.operators import multimodal


def test_glm_recovers_planted_logit(spark):
    # planted model: logit(p) = 0.8*x1 - 1.2*x2 + 0.3
    rng = random.Random(7)
    rows = []
    for _ in range(800):
        x1, x2 = rng.gauss(0, 1), rng.gauss(0, 1)
        p = 1 / (1 + math.exp(-(0.8 * x1 - 1.2 * x2 + 0.3)))
        n = rng.randint(50, 400)
        k = sum(rng.random() < p for _ in range(n))
        rows.append((x1, x2, k / n, float(n)))
    df = spark.createDataFrame(rows, "x1 double, x2 double, prop double, w double")
    model = glm.fit_quasibinomial_glm(df, "prop", ["x1", "x2"], "w")
    coefs = glm.tidy(model, ["x1", "x2"])
    by_term = {c.term: c for c in coefs}
    assert by_term["x1"].estimate == pytest.approx(0.8, abs=0.05)
    assert by_term["x2"].estimate == pytest.approx(-1.2, abs=0.05)
    assert by_term["(Intercept)"].estimate == pytest.approx(0.3, abs=0.05)
    # tidy invariants: OR = exp(est), CI brackets the estimate
    x1 = by_term["x1"]
    assert x1.odds_ratio == pytest.approx(math.exp(x1.estimate))
    assert x1.conf_low < x1.odds_ratio < x1.conf_high
    assert x1.std_error > 0


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", "image/png", "s3://m/1"),
        (2, "video", b"\x00\x00ftyp fake video", "video/mp4", "s3://m/2"),
        (3, "audio", b"RIFF fake audio", "audio/wav", "s3://m/3"),
        (4, "image", None, "image/png", "s3://m/4"),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_fake_decoder(spark, media_df):
    out = {r.media_id: r for r in multimodal.extract_features(media_df).collect()}
    assert out[1].width is not None and out[1].height is not None
    assert out[1].duration_ms is None  # images have no duration
    assert out[2].duration_ms is not None and out[2].width is not None
    assert out[3].duration_ms is not None and out[3].width is None
    assert out[4].n_bytes == 0 and out[4].checksum is None
    # deterministic: same payload -> same checksum across runs
    again = {r.media_id: r for r in multimodal.extract_features(media_df).collect()}
    assert out[1].checksum == again[1].checksum


def test_strict_decoder_raises(spark, media_df):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        multimodal.extract_features(media_df, decoder=multimodal.strict_decoder).collect()
    # every fixture payload is fake, so several parallel tasks raise at
    # once and whichever surfaces first wins — accept any of the strict
    # decoder's loud per-format failures (NotImplementedError for
    # unknown magics, the RIFF/WAVE container check for the fake-RIFF
    # row), never a silent fabricated feature row
    msg = str(exc_info.value)
    assert (
        "NotImplementedError" in msg
        or "real media decoding" in msg
        or "no pure-stdlib decoder" in msg
        or "not a RIFF/WAVE container" in msg
    )


def test_png_codec_roundtrip_all_filters():
    """Round 5 (VERDICT r4 #5): the pure-stdlib PNG decoder must
    recover the exact raster through all five scanline filter types
    (encode_png varies the filter per row), match the closed-form
    byte-size formula the SQL oracle uses, and fail loudly on chunk
    corruption and unsupported features."""
    for w, h, seed in [(1, 1, 0), (4, 3, 7), (29, 17, 42), (64, 11, 255)]:
        b = multimodal.encode_png(w, h, seed=seed)
        raw = h * (1 + 3 * w)
        assert len(b) == 63 + raw + 5 * ((raw + 65534) // 65535)
        meta = multimodal.strict_decoder(b, "image")
        assert (meta["width"], meta["height"], meta["duration_ms"]) == (w, h, None)
        assert meta["n_bytes"] == len(b)
        raster = multimodal._decode_png(b, return_raster=True)
        expected = bytes(
            (seed + x * 7 + y * 13 + c * 29) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        assert raster == expected

    # corruption: any flipped IDAT byte must fail the chunk CRC
    bad = bytearray(multimodal.encode_png(8, 8, seed=1))
    bad[60] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        multimodal._decode_png(bytes(bad))
    # interlaced / non-8-bit PNGs stay loud, not silently wrong
    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # Adam7 flag
    chunk = (
        _s.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + _s.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="interlace"):
        multimodal._decode_png(multimodal._PNG_MAGIC + chunk)
    # JPEG magic now routes to the real decoder (wave 119), which fails
    # loudly on a truncated/garbage stream; codecs that remain
    # unimplemented (MP3) still hit the NotImplementedError slot
    with pytest.raises(ValueError, match="JPEG"):
        multimodal.strict_decoder(b"\xff\xd8\xff\xe0payload", "image")
    with pytest.raises(NotImplementedError):
        multimodal.strict_decoder(b"ID3\x04mp3-payload", "audio")


def test_sample_frames_video_only(spark, media_df):
    frames = multimodal.sample_frames(media_df, every_ms=60_000, max_frames=4).collect()
    assert frames and all(r.media_id == 2 for r in frames)
    assert [r.frame_index for r in frames] == list(range(len(frames)))
    assert all(len(r.frame_checksum) == 8 for r in frames)


def test_semdedup_drops_exact_twin_keeps_lowest_id(spark):
    from mcas_question2_etl_spark.operators.semdedup import semdedup_keep

    # 6 seed vectors (ids 0-5 become initial centroids for k=6) plus an
    # exact twin of id 2 at id 10: cosine(v2, v10) == 1.0 -> only the
    # twin (higher id) must be dropped, everything else kept
    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [1.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 1.0],
    ]
    rows = [(i, v) for i, v in enumerate(base)] + [(10, base[2])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.keep for r in semdedup_keep(df, k=6, iters=1, threshold=0.95).collect()}
    assert got == {0: True, 1: True, 2: True, 3: True, 4: True, 5: True, 10: False}


def test_pca_projection_matches_numpy(spark):
    """Distributed Gram-partial PCA (operators/pca.py) equals full
    in-memory numpy PCA: same covariance, same top-2 axes (up to the
    deterministic sign convention), same projections."""
    import numpy as np

    from mcas_question2_etl_spark.operators import pca

    rng = np.random.RandomState(7)
    base = rng.normal(size=(200, 2)) @ np.array([[3.0, 0.5, 0.1, 0.0],
                                                 [0.0, 1.0, 0.2, 0.05]])
    data = base + 0.01 * rng.normal(size=(200, 4))
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>",
    ).repartition(5)

    cov, mean, n = pca.covariance_matrix(df, "embedding", dim=4)
    assert n == 200
    np.testing.assert_allclose(mean, data.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(data.T, bias=True), atol=1e-9)

    comps, vals, mu = pca.pca_components(df, "embedding", k=2)
    evals, evecs = np.linalg.eigh(np.cov(data.T, bias=True))
    order = np.argsort(evals)[::-1][:2]
    want = evecs[:, order].T.copy()
    for i in range(2):
        j = int(np.argmax(np.abs(want[i])))
        if want[i, j] < 0:
            want[i] = -want[i]
    np.testing.assert_allclose(comps, want, atol=1e-8)
    np.testing.assert_allclose(vals, evals[order], atol=1e-8)

    got = {
        r.vec_id: r.pc
        for r in pca.project(df, comps, mu, "embedding").select(
            "vec_id", "pc"
        ).collect()
    }
    want_proj = (data - data.mean(axis=0)) @ want.T
    for i in range(200):
        np.testing.assert_allclose(got[i], want_proj[i], atol=1e-8)


class TestStrictDecoder:
    """Round 4: real pure-stdlib decode for BMP/PPM/WAV (VERDICT r3 #3)."""

    def test_bmp_roundtrip_and_padding(self):
        from mcas_question2_etl_spark.operators.multimodal import (
            encode_bmp, strict_decoder)
        # width 17 -> 51 pixel bytes/row, padded to 52
        b = encode_bmp(17, 9, seed=5)
        d = strict_decoder(b, "image")
        assert (d["width"], d["height"]) == (17, 9)
        assert d["n_bytes"] == 54 + 52 * 9

    def test_bmp_topdown_negative_height(self):
        import struct
        from mcas_question2_etl_spark.operators.multimodal import (
            encode_bmp, strict_decoder)
        b = bytearray(encode_bmp(4, 6))
        struct.pack_into("<i", b, 22, -6)  # biHeight < 0 = top-down
        d = strict_decoder(bytes(b), "image")
        assert (d["width"], d["height"]) == (4, 6)

    def test_bmp_truncated_pixels_raises(self):
        import pytest
        from mcas_question2_etl_spark.operators.multimodal import (
            encode_bmp, strict_decoder)
        b = encode_bmp(10, 10)
        with pytest.raises(ValueError, match="truncated"):
            strict_decoder(b[:-5], "image")

    def test_ppm_with_comments(self):
        from mcas_question2_etl_spark.operators.multimodal import strict_decoder
        b = b"P6\n# a comment\n5 3\n# another\n255\n" + bytes(45)
        d = strict_decoder(b, "image")
        assert (d["width"], d["height"]) == (5, 3)

    def test_pgm_p5_grayscale(self):
        from mcas_question2_etl_spark.operators.multimodal import strict_decoder
        b = b"P5 7 2 255\n" + bytes(14)
        d = strict_decoder(b, "image")
        assert (d["width"], d["height"]) == (7, 2)

    def test_ascii_pnm_rejected(self):
        import pytest
        from mcas_question2_etl_spark.operators.multimodal import strict_decoder
        # ASCII P3 is not sniffed as a binary PNM — falls to the
        # unsupported-format path and fails loudly
        with pytest.raises(NotImplementedError):
            strict_decoder(b"P3\n1 1\n255\n1 2 3\n", "image")

    def test_wav_duration_exact(self):
        from mcas_question2_etl_spark.operators.multimodal import (
            encode_wav, strict_decoder)
        for dur in (1, 999, 1234, 60000):
            d = strict_decoder(encode_wav(dur), "audio")
            assert d["duration_ms"] == dur

    def test_wav_extra_chunk_walked(self):
        import struct
        from mcas_question2_etl_spark.operators.multimodal import (
            encode_wav, strict_decoder)
        # inject a LIST chunk between fmt and data
        b = encode_wav(100)
        fmt_end = b.index(b"data")
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        b2 = b[:fmt_end] + extra + b[fmt_end:]
        b2 = b2[:4] + struct.pack("<I", len(b2) - 8) + b2[8:]
        assert strict_decoder(b2, "audio")["duration_ms"] == 100

    def test_compressed_formats_raise(self):
        import pytest
        from mcas_question2_etl_spark.operators.multimodal import strict_decoder
        # PNG and JPEG are REAL decoders (rounds 5 and 7) — malformed
        # bodies now fail their parse loudly rather than hitting the
        # codec gap; MP3 remains the NotImplementedError slot
        with pytest.raises(ValueError):
            strict_decoder(b"\x89PNG\r\n\x1a\n....", "image")
        with pytest.raises(ValueError):
            strict_decoder(b"\xff\xd8\xff\xe0JFIF", "image")
        with pytest.raises(NotImplementedError):
            strict_decoder(b"ID3\x04....", "audio")
