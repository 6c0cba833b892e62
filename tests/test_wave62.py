"""Wave-62 tests: CDC boundary-shift immunity, closed-form OLS against
a planted plane, Brier decomposition identity, RSI limits, conformal
rank math."""

from __future__ import annotations

import datetime as dt
import hashlib
import math


def _boundary(tok: str) -> bool:
    return hashlib.md5(tok.encode()).hexdigest()[0] == "0"


def test_cdc_chunks_match_local_reference(spark):
    from mcas_question2_etl_spark.operators.chunking import cdc_chunks

    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "one two three four five six seven eight nine ten eleven twelve",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r.doc_id, []).append(r.chunk_text)
    for doc_id, text in texts.items():
        chunks, cur = [], []
        for tok in text.split(" "):
            cur.append(tok)
            if _boundary(tok):
                chunks.append(" ".join(cur))
                cur = []
        if cur:
            chunks.append(" ".join(cur))
        assert sorted(got.get(doc_id, [])) == sorted(chunks), doc_id


def test_cdc_boundary_shift_immunity(spark):
    """Prepending a token changes at most the FIRST chunk — every chunk
    after the first boundary is identical (the CDC property)."""
    from mcas_question2_etl_spark.operators.chunking import cdc_chunks

    base = "w%d " % 0 + " ".join(f"tok{i}" for i in range(200))
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], ["doc_id", "text"]
    )
    out = {}
    for r in cdc_chunks(df).collect():
        out.setdefault(r.doc_id, []).append(r.chunk_text)
    shared = set(out[1]) & set(out[2])
    # all but the leading chunk of each doc must be shared
    assert len(shared) >= len(out[1]) - 1
    assert len(shared) >= len(out[2]) - 1
    assert len(out[1]) > 3  # the corpus actually chunked


def test_granger_recovers_planted_plane(spark, tmp_path):
    """y_t = 2 + 3*p_{t-1} + 0.5*c_{t-1} exactly -> OLS recovers the
    coefficients with r2 = 1."""
    from mcas_question2_etl_spark.plans.stats_specs import granger_lag_regression

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # seed day 0: p=4, c=8; then day t: p = 2 + 3*p_prev + 0.5*c_prev
    p_prev, c_prev = 4, 8
    counts = [(4, 8)]
    for t in range(1, 12):
        p = 2 + 3 * p_prev + (c_prev // 2)
        c = 6 + 2 * (t % 3)  # varies independently
        counts.append((p, c))
        p_prev, c_prev = p, c
    for t, (p, c) in enumerate(counts):
        day = base + dt.timedelta(days=t)
        for _ in range(p):
            eid += 1
            rows.append((eid, day, 1, "purchase", 1.0, "{}"))
        for _ in range(c):
            eid += 1
            rows.append((eid, day, 1, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")
    row = granger_lag_regression(spark, str(tmp_path)).collect()[0]
    assert row.n == 11
    assert math.isclose(row.b0, 2.0, abs_tol=1e-4)
    assert math.isclose(row.b1, 3.0, abs_tol=1e-4)
    assert math.isclose(row.b2, 0.5, abs_tol=1e-4)
    assert math.isclose(row.r2, 1.0, abs_tol=1e-6)


def test_brier_decomposition_identity(spark):
    """brier == reliability - resolution + uncertainty exactly, and a
    perfectly calibrated constant-rate forecaster has reliability 0."""
    from mcas_question2_etl_spark.operators.evaluation import brier_decomposition

    # one bin, train rate 0.5, test rate 0.5 -> rel 0, res 0, unc 0.25
    train = spark.createDataFrame(
        [(0, True), (0, False), (0, True), (0, False)], ["b", "y"]
    )
    test = spark.createDataFrame(
        [(0, True), (0, False)], ["b", "y"]
    )
    r = brier_decomposition(train, test, "b", "y").collect()[0]
    assert r.n_test == 2
    assert r.reliability == 0.0
    assert r.resolution == 0.0
    assert math.isclose(r.uncertainty, 0.25, abs_tol=1e-9)
    assert math.isclose(r.brier, 0.25, abs_tol=1e-9)

    # unseen test bin falls back to the global train rate
    test2 = spark.createDataFrame([(7, True), (7, True)], ["b", "y"])
    r2 = brier_decomposition(train, test2, "b", "y").collect()[0]
    # f = 0.5, obar_k = 1 -> reliability = 0.25; obar = 1 -> unc = 0
    assert math.isclose(r2.reliability, 0.25, abs_tol=1e-9)
    assert math.isclose(r2.uncertainty, 0.0, abs_tol=1e-9)
    assert math.isclose(
        r2.brier, r2.reliability - r2.resolution + r2.uncertainty, abs_tol=1e-9
    )


def test_rsi_limits_and_window(spark):
    from mcas_question2_etl_spark.operators.timeseries import rsi_cutler

    base = dt.datetime(2024, 1, 1)
    # strictly increasing series: every delta > 0 -> RSI = 100
    rows = [(i, base + dt.timedelta(days=i), float(10 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    out = rsi_cutler(df, "ts", "value").collect()
    # 20 days -> 19 deltas -> 6 full 14-delta windows
    assert len(out) == 6
    assert all(r.rsi == 100.0 for r in out)

    # strictly decreasing -> RSI = 0
    rows = [(i, base + dt.timedelta(days=i), float(100 - i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    out = rsi_cutler(df, "ts", "value").collect()
    assert all(r.rsi == 0.0 for r in out)


def test_conformal_rank_and_coverage(spark, tmp_path):
    """Planted single-priority orders: the model mean, the order
    statistic and the coverage are all hand-computable."""
    from mcas_question2_etl_spark.plans.stats_specs import conformal_interval_coverage
    from mcas_question2_etl_spark.operators.sampling import hash_bucket
    import pyspark.sql.functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, k % 7, base, 100.0 + (k % 11), "O", "1-URGENT") for k in range(300)
    ]
    df = spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
         "o_orderstatus", "o_orderpriority"],
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/orders.parquet")
    out = conformal_interval_coverage(spark, str(tmp_path)).collect()[0]
    # fold sizes from the same hash the plan uses
    folds = (
        df.select(hash_bucket("o_orderkey", 3).alias("f"))
        .groupBy("f").count().collect()
    )
    sizes = {r.f: r["count"] for r in folds}
    assert out.n_calib == sizes[1]
    assert out.k_rank == math.ceil(0.9 * (sizes[1] + 1))
    assert out.n_test == sizes[2]
    assert 0.0 <= out.coverage <= 1.0
    # q_hat is an actual calibration residual, bounded by the residual range
    assert 0.0 <= out.q_hat <= 11.0
