"""Wave-49 tests: Kruskal-Wallis hand example, Mann-Kendall monotone
pin, isotonic PAV textbook case, Coleman-Liau known counts, Holt
python-replay."""

from __future__ import annotations

import datetime as dt
import math


def test_kruskal_wallis_hand_example(spark):
    from mcas_question2_etl_spark.operators.evaluation import kruskal_wallis

    # classic 3-group example, no ties: A={1,2}, B={3,4}, C={5,6}
    rows = [("A", 1), ("A", 2), ("B", 3), ("B", 4), ("C", 5), ("C", 6)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in kruskal_wallis(df, "g", "v").collect()}
    # rank sums: A=3, B=7, C=11; H = 12/(6*7) * (9/2+49/2+121/2) - 21
    h = 12 / 42 * (9 / 2 + 49 / 2 + 121 / 2) - 21
    assert math.isclose(out["A"].h_stat, round(h, 9), rel_tol=1e-9)
    assert math.isclose(out["A"].mean_rank, 1.5, rel_tol=1e-12)
    assert math.isclose(out["C"].mean_rank, 5.5, rel_tol=1e-12)
    assert out["A"].df == 2
    # no ties -> correction is 1 -> h_adj == h
    assert math.isclose(out["A"].h_adj, out["A"].h_stat, rel_tol=1e-12)


def test_kruskal_wallis_ties_identical_groups(spark):
    from mcas_question2_etl_spark.operators.evaluation import kruskal_wallis

    # both groups hold the same multiset -> mean ranks equal, H ~ 0
    rows = [("A", 5)] * 3 + [("A", 7)] * 2 + [("B", 5)] * 3 + [("B", 7)] * 2
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in kruskal_wallis(df, "g", "v").collect()}
    assert math.isclose(out["A"].mean_rank, out["B"].mean_rank, rel_tol=1e-12)
    assert abs(out["A"].h_adj) < 1e-9


def test_mann_kendall_monotone_series(spark):
    from mcas_question2_etl_spark.operators.timeseries import mann_kendall_trend

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # strictly increasing daily counts 1..6 -> S = 15 = n(n-1)/2, tau=1
    for day in range(6):
        for _ in range(day + 1):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "up"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = mann_kendall_trend(df).collect()[0]
    assert out.n_days == 6 and out.s_stat == 15
    assert math.isclose(out.tau_b, 1.0, rel_tol=1e-12)
    # var = 6*5*17/18; z = 14/sqrt(var)
    var = 6 * 5 * 17 / 18
    assert math.isclose(out.var_s, var, rel_tol=1e-12)
    assert math.isclose(out.z, 14 / math.sqrt(var), rel_tol=1e-12)


def test_mann_kendall_flat_series_zero(spark):
    from mcas_question2_etl_spark.operators.timeseries import mann_kendall_trend

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(5):  # constant 2/day -> S=0, all pairs tied
        for _ in range(2):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "flat"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = mann_kendall_trend(df).collect()[0]
    assert out.s_stat == 0 and out.z == 0.0 and out.tau_b == 0.0


def test_isotonic_pav_textbook(spark):
    from mcas_question2_etl_spark.operators.regression import isotonic_fit

    # y = [1, 3, 2, 4] unit weights: PAV pools the (3,2) violation
    # -> fit [1, 2.5, 2.5, 4]
    rows = [(0, 1, 1), (1, 3, 1), (2, 2, 1), (3, 4, 1)]
    df = spark.createDataFrame(rows, ["bucket", "num", "den"])
    out = {r.bucket: r.iso_rate for r in
           isotonic_fit(df, "bucket", "num", "den").collect()}
    assert math.isclose(out[0], 1.0, rel_tol=1e-12)
    assert math.isclose(out[1], 2.5, rel_tol=1e-12)
    assert math.isclose(out[2], 2.5, rel_tol=1e-12)
    assert math.isclose(out[3], 4.0, rel_tol=1e-12)


def test_isotonic_weighted_pool(spark):
    from mcas_question2_etl_spark.operators.regression import isotonic_fit

    # weighted violation: rates [0.9 (w10), 0.1 (w30)] -> pooled
    # (9+3)/(10+30) = 0.3 for both buckets
    rows = [(0, 9, 10), (1, 3, 30)]
    df = spark.createDataFrame(rows, ["bucket", "num", "den"])
    out = {r.bucket: r.iso_rate for r in
           isotonic_fit(df, "bucket", "num", "den").collect()}
    assert math.isclose(out[0], 0.3, rel_tol=1e-12)
    assert math.isclose(out[1], 0.3, rel_tol=1e-12)


def test_isotonic_monotone_input_unchanged(spark):
    from mcas_question2_etl_spark.operators.regression import isotonic_fit

    rows = [(0, 1, 10), (1, 5, 10), (2, 9, 10)]
    df = spark.createDataFrame(rows, ["bucket", "num", "den"])
    for r in isotonic_fit(df, "bucket", "num", "den").collect():
        assert math.isclose(r.iso_rate, r.rate, rel_tol=1e-12)


def test_coleman_liau_known_counts(spark):
    from mcas_question2_etl_spark.operators.text import coleman_liau_report

    # "Nice cat. Big dog!" -> letters 13, words 4, sentences 2
    df = spark.createDataFrame(
        [("s", "Nice cat. Big dog!")], ["source", "text"]
    )
    out = coleman_liau_report(df).collect()[0]
    assert out.letters == 13 and out.words == 4 and out.sentences == 2
    lp, sp = 13 / 4 * 100, 2 / 4 * 100
    assert math.isclose(out.cli, 0.0588 * lp - 0.296 * sp - 15.8, rel_tol=1e-12)


def test_holt_python_replay(spark):
    from mcas_question2_etl_spark.operators.timeseries import holt_linear_backtest

    base = dt.datetime(2024, 1, 1)
    counts = [3, 5, 4, 8, 7, 11, 10, 14]
    rows = []
    eid = 0
    for day, n in enumerate(counts):
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "t"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = holt_linear_backtest(df, alpha=0.5, beta=0.3).collect()[0]
    l, b, e = float(counts[0]), 0.0, 0.0
    for x in counts[1:]:
        f = l + b
        nl = 0.5 * x + 0.5 * f
        nb = 0.3 * (nl - l) + 0.7 * b
        e += abs(x - f)
        l, b = nl, nb
    assert out.n_days == len(counts)
    assert math.isclose(out.mae, e / (len(counts) - 1), rel_tol=1e-12)
    assert math.isclose(out.level, l, rel_tol=1e-12)
    assert math.isclose(out.trend, b, rel_tol=1e-12)
    assert math.isclose(out.forecast_next, l + b, rel_tol=1e-12)


def test_holt_single_day_degenerate(spark):
    from mcas_question2_etl_spark.operators.timeseries import holt_linear_backtest

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, "x")],
        ["event_id", "ts", "user_id", "event_type"],
    )
    out = holt_linear_backtest(df).collect()[0]
    assert out.n_days == 1 and out.mae == 0.0
    assert math.isclose(out.level, 1.0) and out.trend == 0.0
