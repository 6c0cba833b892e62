"""Wave-82 hand pins: pure-stdlib GIF decode (VERDICT r5 #5) — the
LZW codec round-trips against an independent reference, the container
walk reads real GIF structures, and corruption raises loudly.

Covered spec name: multimodal_gif_decode.
"""

from __future__ import annotations

import struct

import pytest

from mcas_question2_etl_spark.operators import multimodal as mm


# ── LZW codec ──────────────────────────────────────────────────────────────
def _lzw_decode_reference(data: bytes, min_code_size: int) -> bytes:
    """Independent straight-from-the-spec LZW decoder (different
    structure from the operator's: per-code bit cursor instead of an
    accumulator) used to cross-check the encoder."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    bitpos = 0

    def read(nbits: int) -> int:
        nonlocal bitpos
        v = 0
        for i in range(nbits):
            byte, bit = divmod(bitpos + i, 8)
            if byte >= len(data):
                raise ValueError("truncated")
            v |= ((data[byte] >> bit) & 1) << i
        bitpos += nbits
        return v

    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    size = min_code_size + 1
    out, prev = bytearray(), None
    while True:
        code = read(size)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            size, prev = min_code_size + 1, None
            continue
        if code == eoi:
            return bytes(out)
        entry = table[code] if code < len(table) else prev + prev[:1]
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << size) and size < 12:
                size += 1
        prev = entry


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"\x00",
        b"a" * 4096,  # KwKwK chains
        bytes(range(256)) * 8,  # pure literals, dictionary misses
        bytes(((i >> 3) * 37) & 0xFF for i in range(5000)),  # runs
        bytes((i * 197 + (i >> 5)) & 0xFF for i in range(3000)),
    ],
)
def test_lzw_roundtrip_vs_reference(data):
    enc = mm._gif_lzw_encode(data, min_code_size=8)
    assert mm._gif_lzw_decode(enc, 8) == data
    # the encoder's bitstream must be spec-LZW, not merely something
    # the sibling decoder happens to invert: an independent decoder
    # with a different bit-reading structure must agree
    assert _lzw_decode_reference(enc, 8) == data


def test_lzw_12bit_table_reset():
    """A stream long/low-entropy enough to fill the 4096-entry table
    forces the encoder's mid-stream CLEAR; decode must follow."""
    data = bytes((i * i >> 4) & 0xFF for i in range(120_000))
    enc = mm._gif_lzw_encode(data, min_code_size=8)
    assert mm._gif_lzw_decode(enc, 8) == data
    # dictionary growth actually happened: runs compress below 1 byte/px
    runs = bytes(((i >> 4) * 11) & 0xFF for i in range(20_000))
    assert len(mm._gif_lzw_encode(runs)) < len(runs) / 2


def test_lzw_truncation_raises():
    enc = mm._gif_lzw_encode(b"hello world" * 20)
    with pytest.raises(ValueError, match="truncated"):
        mm._gif_lzw_decode(enc[: len(enc) // 2], 8)


# ── container walk ─────────────────────────────────────────────────────────
def test_gif_roundtrip_metadata_and_raster():
    for w, h, seed, delay in [(8, 6, 0, None), (31, 17, 5, 7), (64, 48, 123, 0)]:
        g = mm.encode_gif(w, h, delay_cs=delay, seed=seed)
        meta = mm.strict_decoder(g, "image")
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["duration_ms"] == (None if delay is None else delay * 10)
        assert meta["n_bytes"] == len(g)
        assert mm._decode_gif(g, return_raster=True) == mm.gif_pixels(
            w, h, seed
        )


def test_gif_multiframe_duration_sums():
    """Two frames, two Graphic Control delays: duration is the sum and
    every frame's raster is fully LZW-verified."""
    f1 = mm.encode_gif(5, 4, delay_cs=10, seed=1)
    f2 = mm.encode_gif(5, 4, delay_cs=25, seed=2)
    # splice frame 2's GCE+descriptor+data before frame 1's trailer
    two = f1[:-1] + f2[13 + 768 :]
    meta = mm._decode_gif(two)
    assert meta["duration_ms"] == 350
    assert mm._decode_gif(two, return_raster=True) == mm.gif_pixels(5, 4, 1)


def test_gif_corruption_raises():
    g = mm.encode_gif(9, 7, delay_cs=4, seed=3)
    with pytest.raises(ValueError, match="not a GIF"):
        mm._decode_gif(b"JIF89a" + g[6:])
    # frame descriptor claims more pixels than the LZW stream holds
    # (descriptor sits after 13-byte header+LSD, 768-byte GCT, 8-byte GCE)
    bad = bytearray(g)
    off = 13 + 768 + 8
    assert bad[off] == 0x2C
    struct.pack_into("<HH", bad, off + 5, 90, 70)
    with pytest.raises(ValueError, match="raster|truncated"):
        mm._decode_gif(bytes(bad))
    with pytest.raises(ValueError, match="trailer|truncated"):
        mm._decode_gif(g[:-1])  # trailer byte gone
    with pytest.raises(ValueError, match="no image frames"):
        mm._decode_gif(g[:13] + bytes(768) + b"\x3b")


def test_strict_decoder_dispatches_gif_by_magic():
    """Mislabeled media_type must not matter — dispatch is by magic."""
    g = mm.encode_gif(12, 5, seed=9)
    assert mm.strict_decoder(g, "audio")["width"] == 12
