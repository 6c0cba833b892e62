"""Wave-89 hand pins: baseline TIFF codec and average precision.
TIFF: the decoder is cross-checked against hand-built byte layouts
(both endiannesses, single vs multi strip, inline vs offset tag
values) plus truncation/compression corruption paths. AP: recomputed
by the textbook loop over hand fixtures, including the tie-order
contract and the no-relevant convention.

Covered spec names: multimodal_tiff_decode, average_precision_retrieval.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators import multimodal as mm
from mcas_question2_etl_spark.operators.evaluation import average_precision


def test_tiff_roundtrip_matrix():
    for be in (False, True):
        for rps in (None, 1, 2, 5):
            for w, h, seed in [(1, 1, 0), (9, 7, 5), (21, 4, 250)]:
                b = mm.encode_tiff(
                    w, h, seed=seed, big_endian=be, rows_per_strip=rps
                )
                meta = mm._decode_tiff(b)
                assert meta == {
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }, (be, rps, w, h)
                raster = mm._decode_tiff(b, return_raster=True)
                assert raster == mm.tiff_pixels(w, h, seed=seed)


def test_tiff_strict_decoder_dispatch_by_magic():
    b = mm.encode_tiff(6, 5, seed=3)
    out = mm.strict_decoder(b, "mislabeled/whatever")
    assert (out["width"], out["height"]) == (6, 5)
    assert out["n_bytes"] == len(b)
    bbe = mm.encode_tiff(6, 5, seed=3, big_endian=True)
    out2 = mm.strict_decoder(bbe, "image")
    assert (out2["width"], out2["height"]) == (6, 5)


def test_tiff_corruption_paths_raise_loudly():
    good = mm.encode_tiff(8, 6, seed=1)
    with pytest.raises(ValueError, match="truncated"):
        mm._decode_tiff(good[:4])
    with pytest.raises(ValueError, match="not a TIFF"):
        mm._decode_tiff(b"XXXX" + good[4:])
    # flip the Compression tag value to 5 (LZW) -> loud NotImplementedError
    idx = good.index(bytes([259 & 0xFF, 1]))  # tag 259 little-endian
    bad = bytearray(good)
    bad[idx + 8] = 5
    with pytest.raises(NotImplementedError, match="compression 5"):
        mm._decode_tiff(bytes(bad))
    # truncate a strip
    with pytest.raises(ValueError, match="strip past EOF"):
        mm._decode_tiff(good[:-10])


def _ap_ref(rows):
    """Textbook AP: rows = [(score, rel)] for one query; ties broken by
    the id implicit in list order (caller pre-sorts by (-score, id))."""
    rows = sorted(enumerate(rows), key=lambda t: (-t[1][0], t[0]))
    n_rel = sum(r for _, (_, r) in rows)
    if n_rel == 0:
        return 0.0
    hits, total = 0, 0.0
    for k, (_, (_, rel)) in enumerate(rows, start=1):
        if rel:
            hits += 1
            total += hits / k
    return total / n_rel


def test_average_precision_matches_textbook_loop(spark):
    # query A: rel at ranks 1,3,5 -> AP = (1/1 + 2/3 + 3/5)/3
    # query B: no relevant -> 0.0 by convention
    rows = [
        ("A", 0, 0.9, 1),
        ("A", 1, 0.8, 0),
        ("A", 2, 0.7, 1),
        ("A", 3, 0.6, 0),
        ("A", 4, 0.5, 1),
        ("B", 0, 0.9, 0),
        ("B", 1, 0.8, 0),
    ]
    df = spark.createDataFrame(
        rows, "qid string, doc_id long, score double, rel int"
    )
    out = {r.qid: r for r in average_precision(df).collect()}
    expected_a = (1 / 1 + 2 / 3 + 3 / 5) / 3
    assert out["A"].ap == pytest.approx(expected_a, abs=1e-6)
    assert out["A"].n_relevant == 3 and out["A"].n_candidates == 5
    assert out["B"].ap == 0.0 and out["B"].n_relevant == 0
    ref = _ap_ref([(s, r) for _, _, s, r in rows if _ == 0 or True][:5])
    # cross-check A against the generic loop too
    assert out["A"].ap == pytest.approx(
        _ap_ref([(s, r) for q, _, s, r in rows if q == "A"]), abs=1e-6
    )


def test_average_precision_tie_order_contract(spark):
    # equal scores: doc_id ASC decides; relevant doc with the LOWER id
    # at a tied score must be counted at the earlier rank
    rows = [
        ("Q", 10, 0.5, 0),
        ("Q", 20, 0.5, 1),
        ("Q", 5, 0.5, 1),
    ]
    df = spark.createDataFrame(
        rows, "qid string, doc_id long, score double, rel int"
    )
    out = average_precision(df).collect()[0]
    # tie order by id: 5(rel), 10(non), 20(rel) -> AP = (1/1 + 2/3)/2
    assert out.ap == pytest.approx((1.0 + 2.0 / 3.0) / 2.0, abs=1e-6)


def test_average_precision_perfect_and_inverted(spark):
    perfect = [("P", i, 1.0 - i * 0.1, 1 if i < 3 else 0) for i in range(6)]
    inverted = [("I", i, 1.0 - i * 0.1, 1 if i >= 3 else 0) for i in range(6)]
    df = spark.createDataFrame(
        perfect + inverted, "qid string, doc_id long, score double, rel int"
    )
    out = {r.qid: r for r in average_precision(df).collect()}
    assert out["P"].ap == pytest.approx(1.0, abs=1e-9)
    assert out["I"].ap == pytest.approx(
        _ap_ref([(s, r) for q, _, s, r in inverted]), abs=1e-6
    )
    assert out["I"].ap < out["P"].ap
