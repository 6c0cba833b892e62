"""Wave-65 tests: Good-Turing hand pins, Kendall tau on monotone and
anti-monotone series, Cochran-Armitage on a planted trend, silhouette
on separated clusters, Lorenz accounting identities."""

from __future__ import annotations

import datetime as dt
import math


def test_good_turing_pins(spark, tmp_path):
    """Vocabulary with N_1=2, N_2=1: r*(1) = 2*N_2/N_1 = 1.0, and
    r*(2) = 3*N_3/N_2 = 0 (no N_3)."""
    rows = [
        (1, "aa bb cc cc", "en", "s", 11),  # aa:1 bb:1 cc:2
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/documents.parquet")
    from mcas_question2_etl_spark.plans.text_analytics import good_turing_smoothing

    out = {r.r: r for r in good_turing_smoothing(spark, str(tmp_path)).collect()}
    assert out[1].n_r == 2 and math.isclose(out[1].r_star, 1.0, abs_tol=1e-9)
    assert out[2].n_r == 1 and out[2].r_star == 0.0


def _write_events(spark, tmp_path, counts):
    """counts: list of (purchases, clicks) per consecutive day."""
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
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


def test_kendall_tau_monotone(spark, tmp_path):
    """Strictly co-monotone series -> tau_b = 1; reversing one ->
    tau_b = -1."""
    from mcas_question2_etl_spark.plans.text_analytics import kendall_tau_daily

    _write_events(spark, tmp_path, [(1, 2), (2, 4), (3, 6), (4, 8), (5, 10)])
    r = kendall_tau_daily(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 5 and r.concordant == 10 and r.discordant == 0
    assert r.tau_b == 1.0

    _write_events(spark, tmp_path, [(1, 10), (2, 8), (3, 6), (4, 4), (5, 2)])
    r = kendall_tau_daily(spark, str(tmp_path)).collect()[0]
    assert r.tau_b == -1.0


def test_cochran_armitage_planted_trend(spark, tmp_path):
    """Failure rate rising monotonically with priority score gives a
    large positive z; a flat rate gives z ~ 0."""
    from mcas_question2_etl_spark.plans.text_analytics import cochran_armitage_trend

    base = dt.datetime(2024, 1, 1)
    rows = []
    k = 0
    for s in range(1, 6):
        for i in range(100):
            k += 1
            status = "F" if i < s * 15 else "O"  # 15%..75% by score
            rows.append((k, 1, base, 10.0, status, f"{s}-PRIO"))
    df = spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
         "o_orderstatus", "o_orderpriority"],
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/orders.parquet")
    r = cochran_armitage_trend(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 500
    assert r.z_trend > 8
    assert math.isclose(r.chi2_trend, r.z_trend**2, rel_tol=1e-3)


def test_simplified_silhouette_separated(spark):
    """Two tight, well-separated clouds with k=2: silhouette near 1."""
    from mcas_question2_etl_spark.operators.kmeans import simplified_silhouette

    rows = []
    for i in range(20):
        base = 0.0 if i < 10 else 50.0
        vec = [base + (i % 3) * 0.001 for _ in range(8)]
        rows.append((i if i < 10 else i - 10 + 1_000, vec, 0))
    # seeds vid<2 must hit both clouds: remap ids so 0 is cloud A and
    # 1 is cloud B
    rows = [
        ((0 if r[0] == 0 else (1 if r[0] == 1_000 else r[0] + 2)), r[1], r[2])
        for r in rows
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = simplified_silhouette(df, k=2, iters=2)
    got = out.collect()
    assert len(got) == 2
    assert all(r.mean_silhouette > 0.95 for r in got)
    assert sum(r.n_members for r in got) == 20


def test_lorenz_identities(spark, tmp_path):
    """Shares sum to 1, cum_share is monotone and ends at 1, and with
    equal spends every decile holds ~1/10 of the mass."""
    from mcas_question2_etl_spark.plans.text_analytics import lorenz_curve_deciles

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, k, base, 100.0, "O", "1-URGENT") for k in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
         "o_orderstatus", "o_orderpriority"],
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/orders.parquet")
    out = sorted(lorenz_curve_deciles(spark, str(tmp_path)).collect(),
                 key=lambda r: r.decile)
    assert len(out) == 10
    assert math.isclose(sum(r.share for r in out), 1.0, abs_tol=1e-5)
    assert math.isclose(out[-1].cum_share, 1.0, abs_tol=1e-9)
    cums = [r.cum_share for r in out]
    assert cums == sorted(cums)
    assert all(math.isclose(r.share, 0.1, abs_tol=1e-9) for r in out)
