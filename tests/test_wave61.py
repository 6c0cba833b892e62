"""Wave-61 tests: range-frame inclusion pins, periodogram on a planted
sinusoid, Bollinger breakout on a planted spike, MRR rank math, and
clustering coefficient on known graphs."""

from __future__ import annotations

import datetime as dt
import math


def test_range_frame_90d_inclusion(spark, tmp_path):
    from mcas_question2_etl_spark.plans.graph_specs import range_frame_rolling_spend

    base = dt.datetime(2024, 1, 1)
    rows = [
        # cust 1: orders on day 0, 89, 90 -> day-89 window includes day 0
        # (89 preceding), day-90 window does NOT include day 0
        (1, 1, base, 100.0, "O", "1-URGENT"),
        (2, 1, base + dt.timedelta(days=89), 10.0, "O", "1-URGENT"),
        (3, 1, base + dt.timedelta(days=90), 1.0, "O", "1-URGENT"),
        # cust 2: same-day orders are range-frame peers of each other
        (4, 2, base, 5.0, "O", "1-URGENT"),
        (5, 2, base, 7.0, "O", "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice",
         "o_orderstatus", "o_orderpriority"],
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/orders.parquet")
    out = {r.o_orderkey: r for r in
           range_frame_rolling_spend(spark, str(tmp_path)).collect()}
    assert out[2].spend_90d == 110.0 and out[2].n_orders_90d == 2
    assert out[3].spend_90d == 11.0 and out[3].n_orders_90d == 2
    # same-day peers both see both rows
    assert out[4].spend_90d == 12.0 and out[5].spend_90d == 12.0


def test_periodogram_planted_weekly(spark):
    from mcas_question2_etl_spark.operators.timeseries import periodogram_power

    # 56 days, event count per day = 10 + 5*cos(2*pi*t/7): a pure
    # 7-day sinusoid over full cycles -> P=7 line ~ 1.0, P=14 ~ 0
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for t in range(56):
        n = 10 + round(5 * math.cos(2 * math.pi * t / 7))
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=t)))
    df = spark.createDataFrame(rows, ["event_id", "ts"])
    out = {r.period_days: r.power_frac
           for r in periodogram_power(df, "ts", [7, 14]).collect()}
    assert out[7] > 0.95
    assert out[14] < 0.05


def test_bollinger_breakout_planted_spike(spark):
    from mcas_question2_etl_spark.operators.timeseries import bollinger_breakouts

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 14 flat-ish days (alternating 10/12), then a huge spike day
    for t in range(14):
        eid += 1
        rows.append((eid, base + dt.timedelta(days=t), 10.0 + 2.0 * (t % 2)))
    rows.append((99, base + dt.timedelta(days=14), 500.0))
    df = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    out = bollinger_breakouts(df, "ts", "value").collect()
    assert len(out) == 1
    assert out[0].day == dt.date(2024, 1, 15)
    assert out[0].side == "above"
    # rows 1..6 have no full window -> never flagged even though the
    # alternating series "breaks" a 1-row band
    assert all(r.day >= dt.date(2024, 1, 7) for r in out)


def test_mrr_rank_math(spark, tmp_path):
    from mcas_question2_etl_spark.plans.graph_specs import mrr_lang_retrieval

    rows = [
        # ranking by n_chars desc, doc_id: 1 (en), 2 (de), 3 (en), 4 (fr)
        (1, "a" * 40, "en", "s", 40),
        (2, "b" * 30, "de", "s", 30),
        (3, "c" * 20, "en", "s", 20),
        (4, "d" * 10, "fr", "s", 10),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/documents.parquet")
    out = {r.lang: r for r in mrr_lang_retrieval(spark, str(tmp_path)).collect()}
    assert out["en"].first_rel_rank == 1
    assert out["de"].first_rel_rank == 2
    assert out["fr"].first_rel_rank == 4
    assert math.isclose(out["fr"].reciprocal_rank, 0.25, abs_tol=1e-9)


def test_clustering_coefficient_known_graphs(spark):
    from mcas_question2_etl_spark.operators.graph_metrics import (
        clustering_coefficient,
    )

    # triangle 1-2-3 plus pendant 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3,
    # node 4 has degree 1 (excluded); transitivity = 3*1 / (1+1+3+0)=3/5
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], ["a", "b"]
    )
    row = clustering_coefficient(edges).collect()[0]
    assert row.n_nodes_deg2 == 3
    assert math.isclose(row.avg_lcc, (1 + 1 + 1 / 3) / 3, abs_tol=1e-6)
    assert math.isclose(row.transitivity, 0.6, abs_tol=1e-6)
    assert row.n_triangles == 1

    # 4-cycle: no triangles anywhere
    square = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["a", "b"]
    )
    row = clustering_coefficient(square).collect()[0]
    assert row.n_triangles == 0
    assert row.avg_lcc == 0.0
