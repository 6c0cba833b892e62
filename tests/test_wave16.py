"""Unit/property tests for wave-16 operators: hamming-band LSH
pairing, exact dyadic EWMA, thumbnail decode plumbing."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("max_hamming", [0, 1, 3])
def test_hamming_band_pairs_equals_brute_force(spark, max_hamming):
    """Banded candidates + exact verify = brute-force all-pairs for
    every threshold the 4-band pigeonhole covers. Fingerprints are
    clustered (few base patterns + small perturbations) so qualifying
    pairs actually exist."""
    from mcas_question2_etl_spark.operators.dedup import hamming_band_pairs

    rng = random.Random(3)
    bases = [rng.getrandbits(64) for _ in range(6)]
    fps = []
    for i in range(120):
        v = bases[i % 6]
        for _ in range(rng.randrange(0, 4)):  # flip up to 3 random bits
            v ^= 1 << rng.randrange(64)
        fps.append((i, v & 0xFFFFFFFF, v >> 32))
    df = spark.createDataFrame(fps, "id long, h1 long, h2 long")
    got = sorted(
        (r.a_id, r.b_id, r.hamming)
        for r in hamming_band_pairs(df, "id", ["h1", "h2"], max_hamming).collect()
    )
    want = sorted(
        (i, j, d)
        for (i, a1, a2), (j, b1, b2) in itertools.combinations(fps, 2)
        if (d := bin((a1 ^ b1) | ((a2 ^ b2) << 32)).count("1")) <= max_hamming
    )
    assert got == want
    assert want, "fixture must actually produce qualifying pairs"


def test_hamming_band_pairs_rejects_uncoverable_threshold(spark):
    from mcas_question2_etl_spark.operators.dedup import hamming_band_pairs

    df = spark.createDataFrame([(1, 0, 0)], "id long, h1 long, h2 long")
    with pytest.raises(ValueError):
        hamming_band_pairs(df, "id", ["h1", "h2"], max_hamming=4, band_bits=16)


def test_ewma_half_matches_recursive_replay(spark):
    """Window-unrolled EWMA == the literal recursion, exactly (dyadic
    alpha means zero float error)."""
    from mcas_question2_etl_spark.operators.timeseries import ewma_half

    rng = random.Random(11)
    rows = [
        (series, day, rng.randrange(0, 10_000))
        for series in ("a", "b")
        for day in range(30)
    ]
    df = spark.createDataFrame(rows, "series string, day int, x long")
    got = {
        (r.series, r.day): r.ewma
        for r in ewma_half(df, ["series"], "day", "x").collect()
    }
    for series in ("a", "b"):
        e = None
        for day in range(30):
            x = dict(((s, d), v) for s, d, v in rows)[(series, day)]
            e = float(x) if e is None else x / 2 + e / 2
            assert got[(series, day)] == e  # exact, not approx


def test_decode_thumbnails_images_only_64_nibbles(spark):
    from mcas_question2_etl_spark.operators.multimodal import (
        decode_thumbnails,
        fake_thumbnail,
    )

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"hello")),
            (2, "audio", bytearray(b"hello")),
        ],
        "media_id long, media_type string, payload binary",
    )
    rows = decode_thumbnails(media).collect()
    assert [r.media_id for r in rows] == [1]
    px = rows[0].pixels
    assert len(px) == 64 and all(0 <= v <= 15 for v in px)
    assert px == fake_thumbnail(b"hello")


def test_ewma_half_long_series_no_overflow(spark):
    """The naive 2^j unroll hits double-infinity near j=1024 and turns
    every later ewma into NaN; the block-renormalized form must stay
    finite and track the literal recursion to float tolerance over a
    2000-row series (truncated carry is sub-ulp)."""
    import math

    from mcas_question2_etl_spark.operators.timeseries import ewma_half

    rng = random.Random(5)
    rows = [("s", day, rng.randrange(0, 10_000)) for day in range(2000)]
    df = spark.createDataFrame(rows, "series string, day int, x long")
    got = {
        r.day: r.ewma for r in ewma_half(df, ["series"], "day", "x").collect()
    }
    e = None
    for _, day, x in rows:
        e = float(x) if e is None else x / 2 + e / 2
        assert math.isfinite(got[day]), f"day {day} not finite"
        assert got[day] == pytest.approx(e, rel=1e-12), f"day {day}"
