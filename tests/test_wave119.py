"""Wave 119 — baseline sequential JPEG codec (VERDICT r6 #7).

Hand-pinned unit tests for the pure stdlib+numpy JPEG implementation in
operators/multimodal.py: canonical huffman code assignment, magnitude
category / EXTEND inverses, lossless coefficient roundtrip through the
entropy coder (incl. byte stuffing and restart markers), quantization
pixel-error bound, loud raises on progressive/12-bit streams, and the
strict_decoder magic dispatch. Spec: multimodal_jpeg_decode
(plans/ml_geo_media.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from mcas_question2_etl_spark.operators import multimodal as mm


def test_canonical_code_assignment_pin():
    """DC-luma Annex-K: bits=[0,1,5,1,...] means category 0 gets the
    single 2-bit code 00, categories 1-5 the 3-bit codes 010..110
    (T.81 C.2 canonical assignment)."""
    codes = mm._jpeg_canonical_codes(*mm._JPEG_HUFF[("dc", 0)])
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)


def test_decode_table_inverts_encode_table():
    for key, (bits, vals) in mm._JPEG_HUFF.items():
        enc = mm._jpeg_canonical_codes(bits, vals)
        dec = mm._jpeg_decode_table(bits, vals)
        assert len(enc) == len(vals) == sum(bits)
        for sym, (code, ln) in enc.items():
            assert dec[(ln, code)] == sym


def test_magnitude_extend_inverse():
    """cat(v) bits + EXTEND must invert the encoder's mapping for every
    representable value (T.81 F.2.1/F.12)."""
    for v in list(range(-255, 256)) + [1023, -1023, 2047, -2047]:
        cat = mm._jpeg_magnitude(v)
        if v == 0:
            assert cat == 0
            continue
        enc = v if v >= 0 else v + (1 << cat) - 1
        assert 0 <= enc < (1 << cat)
        assert mm._jpeg_extend(enc, cat) == v


def test_quality_scaling_pin():
    """libjpeg scaling: q=50 keeps the Annex-K base; q=100 forces all
    ones; q=90 scales by 20%."""
    ql50, _ = mm._jpeg_quant_tables(50)
    assert ql50 == mm._JPEG_QL
    ql100, qc100 = mm._jpeg_quant_tables(100)
    assert set(ql100) == {1} and set(qc100) == {1}
    ql90, _ = mm._jpeg_quant_tables(90)
    assert ql90[0] == (16 * 20 + 50) // 100  # == 3


@pytest.mark.parametrize(
    "w,h,seed,quality,ri",
    [
        (8, 8, 0, 90, 0),
        (25, 18, 7, 90, 0),
        (13, 6, 123, 75, 0),
        (1, 1, 5, 90, 0),
        (32, 17, 999, 95, 1),
        (16, 8, 11, 85, 3),
        (40, 40, 3, 80, 7),
    ],
)
def test_coefficient_roundtrip_exact(w, h, seed, quality, ri):
    """Entropy coding is lossless: the decoder must recover the
    encoder's quantized zigzag coefficients EXACTLY, for every shape,
    quality, and restart interval."""
    payload, enc = mm.encode_jpeg(
        w, h, seed=seed, quality=quality,
        return_coeffs=True, restart_interval=ri,
    )
    dims, dec = mm._decode_jpeg(payload, return_coeffs=True)
    assert (dims["width"], dims["height"]) == (w, h)
    assert dec == enc


def test_pixel_error_bounded():
    """Quantization error on the smooth fixture stays small at
    quality>=75 — the bound the multimodal_jpeg_decode spec grades."""
    for seed in (0, 42, 1234):
        for q in (75, 90, 100):
            payload = mm.encode_jpeg(25, 18, seed=seed, quality=q)
            raster = mm._decode_jpeg(payload, return_raster=True)
            src = np.frombuffer(
                mm.jpeg_pixels(25, 18, seed=seed), dtype=np.uint8
            ).astype(np.int64)
            got = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
            assert np.abs(src - got).max() <= 16, (seed, q)


def test_byte_stuffing_is_exercised():
    """At least one fixture's entropy stream must contain a stuffed
    0xFF00 pair, or the unstuffing path is never tested."""
    found = False
    for seed in range(24):
        payload = mm.encode_jpeg(25, 18, seed=seed, quality=90)
        scan = payload[payload.find(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            found = True
            break
    assert found


def test_restart_markers_present_and_dc_reset():
    payload, enc = mm.encode_jpeg(
        32, 17, seed=9, quality=90, return_coeffs=True, restart_interval=2
    )
    body = payload[payload.find(b"\xff\xda") : -2]
    assert any(bytes([0xFF, 0xD0 + i]) in body for i in range(8))
    assert b"\xff\xdd" in payload  # DRI segment
    _, dec = mm._decode_jpeg(payload, return_coeffs=True)
    assert dec == enc


def test_strict_decoder_dispatches_jpeg():
    payload = mm.encode_jpeg(14, 9, seed=3)
    meta = mm.strict_decoder(payload, "image")
    assert (meta["width"], meta["height"]) == (14, 9)
    assert meta["n_bytes"] == len(payload)


def test_progressive_and_12bit_raise_loudly():
    payload = bytearray(mm.encode_jpeg(8, 8, seed=1))
    sof = payload.find(b"\xff\xc0")
    progressive = payload[:sof] + b"\xff\xc2" + payload[sof + 2 :]
    with pytest.raises(NotImplementedError, match="SOF"):
        mm._decode_jpeg(bytes(progressive))
    twelve = bytearray(payload)
    twelve[sof + 4] = 12  # precision byte
    with pytest.raises(NotImplementedError, match="precision"):
        mm._decode_jpeg(bytes(twelve))
    with pytest.raises(ValueError, match="SOI"):
        mm._decode_jpeg(b"\x00\x01\x02")
