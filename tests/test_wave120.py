"""Wave 120 — G.711 mu-law / A-law companding + IMA ADPCM codecs.

Hand-pinned unit tests for the pure-integer audio codecs in
operators/multimodal.py: code-level idempotence over all 256 codes
(modulo mu-law's standard negative-zero alias 0x7F), known-value pins
from the public specs, companding error bounds over the full int16
sweep, decode monotonicity, and the ADPCM exact mirror-state-machine
property. Spec: audio_codec_roundtrip (plans/ml_geo_media.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

from mcas_question2_etl_spark.operators import multimodal as mm


def test_ulaw_code_idempotence():
    """decode->encode returns the same code for all 256 codes except
    0x7F: G.711 mu-law has 255 distinct levels — 0x7F is 'negative
    zero', decodes to 0, and 0 re-encodes as 0xFF (the positive zero
    code). Both aliases must decode to the same sample."""
    for c in range(256):
        rt = mm.ulaw_encode_sample(mm.ulaw_decode_sample(c))
        if c == 0x7F:
            assert rt == 0xFF
            assert mm.ulaw_decode_sample(0x7F) == mm.ulaw_decode_sample(0xFF) == 0
        else:
            assert rt == c, c


def test_alaw_code_idempotence():
    for c in range(256):
        assert mm.alaw_encode_sample(mm.alaw_decode_sample(c)) == c, c


def test_g711_known_values():
    """Spec pins: zero and full-scale behavior."""
    assert mm.ulaw_encode_sample(0) == 0xFF
    assert mm.ulaw_decode_sample(0xFF) == 0
    assert mm.ulaw_encode_sample(32767) == 0x80  # top positive segment
    assert mm.ulaw_encode_sample(-32768) == 0x00
    # A-law: 0 lands in segment 0 with the 0x55 inversion
    assert mm.alaw_encode_sample(0) == (0x80 ^ 0x55) ^ 0  # == 0xD5
    assert mm.alaw_decode_sample(mm.alaw_encode_sample(0)) == 8


def test_g711_error_bound_full_sweep():
    """Companding error <= 512 (half the top-segment quantization
    interval) everywhere in int16 — the bound the spec's
    all_g711_bounded invariant grades."""
    for x in range(-32768, 32768, 3):
        cu = max(-32635, min(32635, x))
        assert abs(mm.ulaw_decode_sample(mm.ulaw_encode_sample(x)) - cu) <= 512
        assert abs(mm.alaw_decode_sample(mm.alaw_encode_sample(x)) - x) <= 512


def test_g711_decode_monotone_in_magnitude():
    """Within each sign, decoded values must be strictly monotone in
    the code's (segment, mantissa) order — log companding preserves
    order."""
    # positive mu-law samples have sign=0 BEFORE the ones-complement,
    # so the stored byte is ~(seg<<4|mant) with the top bit set
    pos_u = [mm.ulaw_decode_sample((~(s << 4 | m)) & 0xFF)
             for s in range(8) for m in range(16)]
    assert all(a > b for a, b in zip(pos_u[1:], pos_u))
    pos_a = [mm.alaw_decode_sample((0x80 | (s << 4) | m) ^ 0x55)
             for s in range(8) for m in range(16)]
    assert all(a > b for a, b in zip(pos_a[1:], pos_a))


def test_adpcm_step_table_pins():
    """IMA spec pins: 89 steps from 7 to 32767; index table."""
    assert len(mm._ADPCM_STEPS) == 89
    assert mm._ADPCM_STEPS[0] == 7
    assert mm._ADPCM_STEPS[-1] == 32767
    assert mm._ADPCM_IDX == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_adpcm_decoder_mirrors_encoder_exactly():
    for seed in (0, 7, 123, 9999):
        pcm = mm.pcm_fixture(480, seed=seed)
        data, recon = mm.adpcm_encode(pcm)
        assert len(data) == (len(pcm) + 1) // 2
        assert mm.adpcm_decode(data, len(pcm)) == recon


def test_adpcm_single_step_pin():
    """First sample 1000 from state (0,0): step=7, diff=1000 -> code
    0b111 (step+step/2+step/4 subtracted), recon = 0+7/8+... per the
    reconstruction rule: diff = 7>>3 + 7>>2 + 7>>1 + 7 = 0+1+3+7=11."""
    data, recon = mm.adpcm_encode([1000])
    assert data[0] & 0x0F == 0x07
    assert recon[0] == 11
    assert mm.adpcm_decode(bytes([0x07]), 1) == [11]


def test_adpcm_tracks_signal_after_warmup():
    pcm = mm.pcm_fixture(480, seed=42)
    data, _ = mm.adpcm_encode(pcm)
    dec = mm.adpcm_decode(data, len(pcm))
    tail = [abs(a - b) for a, b in zip(pcm[64:], dec[64:])]
    assert sum(tail) / len(tail) < 600  # 4-bit codec, sane tracking


def test_pcm_fixture_deterministic_and_int16():
    a = mm.pcm_fixture(300, seed=5)
    assert a == mm.pcm_fixture(300, seed=5)
    assert a != mm.pcm_fixture(300, seed=6)
    assert all(-32768 <= v <= 32767 for v in a)


def test_lut_kernel_matches_scalar_reference():
    """The vectorized LUT check must agree with the scalar loop on the
    fixture AND on adversarial constants (full-scale, zero, clip
    boundary)."""
    from mcas_question2_etl_spark.operators.multimodal import (
        g711_bounded_check,
        g711_luts,
    )

    luts = g711_luts()
    for c in range(256):
        assert luts["ud"][c] == mm.ulaw_decode_sample(c)
        assert luts["ad"][c] == mm.alaw_decode_sample(c)
    for x in (-32768, -32635, -1, 0, 1, 32635, 32767, 12345, -9876):
        assert luts["ue"][x + 32768] == mm.ulaw_encode_sample(x)
        assert luts["ae"][x + 32768] == mm.alaw_encode_sample(x)
    assert g711_bounded_check(mm.pcm_fixture(480, seed=3))
    assert g711_bounded_check([-32768, 32767, 0, 1, -1])
