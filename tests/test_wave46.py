"""Wave-46 tests: pattern masking, gap math across partition
boundaries, calendar dow/weekend flags, 2-hop reach on a path graph."""

from __future__ import annotations

import datetime as dt


def test_string_pattern_masks(spark):
    from mcas_question2_etl_spark.operators.profiling import (
        string_pattern_profile,
    )

    rows = [("Customer#001",), ("Customer#002",), ("cust-3",)]
    df = spark.createDataFrame(rows, ["name"])
    out = {r.pattern: r for r in string_pattern_profile(df, "name").collect()}
    assert out["Aaaaaaaa#999"].n_rows == 2
    assert out["Aaaaaaaa#999"].example == "Customer#001"
    assert out["aaaa-9"].n_rows == 1


def test_id_gap_audit_math(spark):
    from mcas_question2_etl_spark.operators.profiling import id_gap_audit

    # ids 1..5, 8, 9, 15 (with a duplicate 8): gaps 6-7 (2) and 10-14 (5)
    rows = [(i,) for i in [1, 2, 3, 4, 5, 8, 8, 9, 15]]
    df = spark.createDataFrame(rows, ["event_id"])
    out = id_gap_audit(df, "event_id").collect()[0]
    assert (out.n_ids, out.id_min, out.id_max) == (8, 1, 15)
    assert out.n_missing == 7 and out.n_gaps == 2 and out.max_gap == 5
    # invariant: span == n_ids + n_missing
    assert out.id_max - out.id_min + 1 == out.n_ids + out.n_missing


def test_calendar_dimension_iso_dow(spark):
    from mcas_question2_etl_spark.operators.timeseries import calendar_dimension

    # 2024-01-01 is a Monday; span two weeks
    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 1),
        (2, dt.datetime(2024, 1, 14, 22), 1),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {r.day.isoformat(): r for r in calendar_dimension(df).collect()}
    assert len(out) == 14
    assert out["2024-01-01"].iso_dow == 1 and not out["2024-01-01"].is_weekend
    assert out["2024-01-06"].iso_dow == 6 and out["2024-01-06"].is_weekend
    assert out["2024-01-07"].iso_dow == 7 and out["2024-01-07"].is_weekend
    assert out["2024-01-01"].iso_week == 1 and out["2024-01-08"].iso_week == 2


def test_two_hop_reach_path_graph(spark):
    from mcas_question2_etl_spark.operators.graph_metrics import two_hop_reach

    # path 1-2-3-4-5: node 3 reaches {2,4} in 1 hop, {1,2,4,5} in <=2
    rows = [(1, 2), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = {r.node: r for r in two_hop_reach(df).collect()}
    assert (out[3].n_1hop, out[3].n_2hop) == (2, 4)
    assert (out[1].n_1hop, out[1].n_2hop) == (1, 2)
    assert (out[2].n_1hop, out[2].n_2hop) == (2, 3)
