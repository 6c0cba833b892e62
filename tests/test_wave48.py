"""Wave-48 tests: Hamilton apportionment exactness and paradox-free
total, XmR violation flags, SLA math, shift-share identity,
pct-of-parent shares summing to 1."""

from __future__ import annotations

import datetime as dt
import math


def test_largest_remainder_total_and_ties(spark):
    from mcas_question2_etl_spark.operators.apportion import (
        largest_remainder_seats,
    )

    # votes A=5, B=3, C=2 for 7 seats: quotas 3.5/2.1/1.4 -> floors
    # 3/2/1 (6), leftover 1 goes to largest remainder (A: .5)
    rows = [("A",)] * 5 + [("B",)] * 3 + [("C",)] * 2
    df = spark.createDataFrame(rows, ["party"])
    out = {r.party: r for r in
           largest_remainder_seats(df, "party", 7).collect()}
    assert out["A"].total_seats == 4
    assert out["B"].total_seats == 2
    assert out["C"].total_seats == 1
    assert sum(r.total_seats for r in out.values()) == 7
    assert out["A"].floor_seats == 3 and out["A"].bonus == 1


def test_xmr_control_chart_flags_spike(spark):
    from mcas_question2_etl_spark.operators.timeseries import xmr_control_chart

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # steady 10/day for 9 days, then a 100-event day
    for day in range(9):
        for _ in range(10):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), 1, "x"))
    for _ in range(100):
        eid += 1
        rows.append((eid, base + dt.timedelta(days=9), 1, "x"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = xmr_control_chart(df).collect()[0]
    # mr: eight 0s then one 90 -> mrbar = 10; xbar = 19
    assert math.isclose(out.mrbar, 10.0, rel_tol=1e-12)
    assert math.isclose(out.xbar, 19.0, rel_tol=1e-12)
    assert out.n_violations == 1  # the 100 day breaches 19 + 26.6


def test_shift_share_identity(spark, tmp_path):
    from mcas_question2_etl_spark.plans.ops_bi_specs import shift_share_events

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # h1: a=10, b=10; h2: a=30, b=10 -> national growth = 2x
    for t, n in [("a", 10), ("b", 10)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, base, 1, t, 1.0, "{}"))
    for t, n in [("a", 30), ("b", 10)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(days=10), 1, t, 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    out = {r.event_type: r for r in shift_share_events(spark, str(tmp_path)).collect()}
    a = out["a"]
    # identity: total = national + competitive
    assert math.isclose(
        a.total_shift, a.national_effect + a.competitive_effect, rel_tol=1e-12
    )
    # national growth (40-20)/20 = 1.0 -> a's national effect = 10
    assert math.isclose(a.national_effect, 10.0, rel_tol=1e-12)
    assert math.isclose(a.competitive_effect, 10.0, rel_tol=1e-12)
    b = out["b"]
    assert b.total_shift == 0 and math.isclose(b.competitive_effect, -10.0, rel_tol=1e-12)


def test_pct_of_parent_shares(spark):
    from mcas_question2_etl_spark.plans.ops_bi_specs import pct_of_parent_rollup
    from tests.conftest import SF_SMALL

    out = pct_of_parent_rollup(spark, SF_SMALL).collect()
    assert len(out) > 0
    total = sum(r.pct_of_total for r in out)
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    by_region = {}
    for r in out:
        by_region.setdefault(r.n_regionkey, 0.0)
        by_region[r.n_regionkey] += r.pct_of_region
    for v in by_region.values():
        assert math.isclose(v, 1.0, rel_tol=1e-9)
