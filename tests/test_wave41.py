"""Wave-41 tests: Kaplan-Meier hand-computed curve and censoring,
RFM scoring direction, ANOVA on a known design, Spearman under ties
and monotone data, seasonal-naive error math."""

from __future__ import annotations

import datetime as dt
import math


def test_kaplan_meier_hand_curve(spark):
    from mcas_question2_etl_spark.operators.survival import kaplan_meier

    base = dt.datetime(2024, 1, 1)

    def ev(eid, uid, day):
        return (eid, base + dt.timedelta(days=day), uid, "c", 1.0)

    # horizon = day 30 (user 9 keeps it alive). Lifetimes:
    #   u1: days 0..2  -> t=2, last day 2  <= 23 -> observed churn
    #   u2: days 0..2  -> t=2, observed
    #   u3: days 0..5  -> t=5, observed
    #   u9: days 0..30 -> t=30, last day 30 > 23 -> censored
    rows = [
        ev(1, 1, 0), ev(2, 1, 2),
        ev(3, 2, 0), ev(4, 2, 2),
        ev(5, 3, 0), ev(6, 3, 5),
        ev(7, 9, 0), ev(8, 9, 30),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {r.t_days: r for r in kaplan_meier(df).collect()}
    # only death times appear; censored t=30 contributes risk, not a row
    assert set(out) == {2, 5}
    assert out[2].n_risk == 4 and out[2].n_events == 2
    assert out[5].n_risk == 2 and out[5].n_events == 1
    assert math.isclose(out[2].survival, 0.5, rel_tol=1e-12)
    assert math.isclose(out[5].survival, 0.25, rel_tol=1e-12)


def test_rfm_scores_point_the_right_way(spark):
    from mcas_question2_etl_spark.operators.segmentation import rfm_segments

    base = dt.datetime(2024, 1, 1)
    rows = []
    ok = 0
    # customer c gets c orders (c = 1..5); customer 5 is also the most
    # recent and biggest spender, customer 1 the stalest and smallest
    for c in range(1, 6):
        for i in range(c):
            ok += 1
            rows.append(
                (ok, c, "O", 100.0 * c, base + dt.timedelta(days=10 * c + i), "1-URGENT")
            )
    df = spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    segs = rfm_segments(df).collect()
    by_seg = {r.segment: r for r in segs}
    # five customers, five distinct quintiles on every axis, and the
    # best customer (5) is 555, the worst (1) is 111
    assert set(by_seg) == {"111", "222", "333", "444", "555"}
    assert by_seg["555"].n_customers == 1
    assert math.isclose(by_seg["555"].avg_monetary, 2500.0, rel_tol=1e-12)
    assert math.isclose(by_seg["111"].avg_monetary, 100.0, rel_tol=1e-12)


def test_anova_f_known_design(spark):
    from mcas_question2_etl_spark.operators.evaluation import anova_f

    # groups A=(1,2,3), B=(4,5,6): grand=3.5, SSB=2*(2-3.5)^2+2*... wait
    # means 2 and 5 -> SSB = 3*(1.5^2)*2 = 13.5, SSW = 2+2 = 4
    # F = (13.5/1)/(4/4) = 13.5
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0), ("B", 5.0), ("B", 6.0)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = anova_f(df, "g", "x").collect()[0]
    assert (out.k, out.n) == (2, 6)
    # r8 contract: intensive outputs only (eta^2 = SSB/SST, F)
    assert math.isclose(out.eta_squared, round(13.5 / 17.5, 6), rel_tol=1e-9)
    assert math.isclose(out.f_stat, 13.5, rel_tol=1e-9)


def test_spearman_monotone_and_ties(spark):
    from mcas_question2_etl_spark.operators.evaluation import spearman_corr

    rows = [
        # group m: strictly monotone -> rho exactly 1
        ("m", 1.0, 10.0), ("m", 2.0, 20.0), ("m", 3.0, 40.0), ("m", 4.0, 80.0),
        # group t: a has a tie; known tie-corrected rho
        ("t", 1.0, 3.0), ("t", 2.0, 2.0), ("t", 2.0, 1.0), ("t", 4.0, 4.0),
    ]
    df = spark.createDataFrame(rows, ["g", "a", "b"])
    out = {r.g: r for r in spearman_corr(df, "g", "a", "b").collect()}
    assert math.isclose(out["m"].spearman_rho, 1.0, rel_tol=1e-12)
    # hand calc, doubled avg ranks: a -> [2,5,5,8], b -> [6,4,2,8];
    # centered dx=[-3,0,0,3], dy=[1,-1,-3,3]: rho = 6/sqrt(18*20)
    assert math.isclose(out["t"].spearman_rho, 6 / math.sqrt(360), rel_tol=1e-12)


def test_seasonal_naive_error_math(spark):
    from mcas_question2_etl_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # day 0: 2 events, day 7: 3 events, day 14: 1 event (type x)
    for day, n in [(0, 2), (7, 3), (14, 1)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "x", 1.0))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = seasonal_naive_backtest(df).collect()
    assert len(out) == 1
    r = out[0]
    # scored days: d7 (a=3,f=2), d14 (a=1,f=3)
    assert r.n_days == 2
    assert math.isclose(r.wape, (1 + 2) / (3 + 1), rel_tol=1e-12)
    assert math.isclose(r.bias, (5 - 4) / 4, rel_tol=1e-12)
    assert math.isclose(r.rmse, math.sqrt((1 + 4) / 2), rel_tol=1e-12)
