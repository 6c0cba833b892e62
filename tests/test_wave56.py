"""Wave-56 tests: log-rank identical-arms null, Hill estimator pin,
growth accounting identity, ABC-XYZ classes, hotspot ranking."""

from __future__ import annotations

import datetime as dt
import math


def test_logrank_no_difference_on_symmetric_arms(spark):
    from mcas_question2_etl_spark.operators.survival import logrank_test

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # every user has the same lifetime pattern -> O ~ E, chi2 small
    for u in range(1, 201):
        life = (u % 10) + 1
        eid += 1
        rows.append((eid, base, u, "x"))
        eid += 1
        rows.append((eid, base + dt.timedelta(days=life), u, "x"))
    # horizon extender so most lifetimes are observed churn
    eid += 1
    rows.append((eid, base + dt.timedelta(days=40), 9999, "x"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = logrank_test(df).collect()[0]
    assert out.n_a + out.n_b == 201
    # identity: total deaths split between arms -> O within [0, total]
    assert 0 <= out.observed_a
    assert out.variance >= 0
    assert not out.significant  # lifetimes independent of arm


def test_hill_alpha_exact_pin(spark):
    from mcas_question2_etl_spark.operators.concentration import (
        hill_powerlaw_alpha,
    )

    # x = {100, 200, 400}: sum ln(x/100) = ln2 + ln4 = 3 ln2
    df = spark.createDataFrame(
        [("g", 100), ("g", 200), ("g", 400), ("g", 50)], ["s", "v"]
    )
    out = hill_powerlaw_alpha(df, "s", "v").collect()[0]
    assert out.n_tail == 3
    expect = 1 + 3 / round(3 * math.log(2), 9)
    assert math.isclose(out.alpha, expect, rel_tol=1e-9)


def test_growth_accounting_identity(spark):
    from mcas_question2_etl_spark.operators.segmentation import (
        monthly_growth_accounting,
    )

    jan, feb, mar = (
        dt.datetime(2024, 1, 5),
        dt.datetime(2024, 2, 5),
        dt.datetime(2024, 3, 5),
    )
    rows = [
        # u1: jan, feb (retained), gone in mar (churned)
        (1, jan, 1, "e", 0.0, "{}"), (2, feb, 1, "e", 0.0, "{}"),
        # u2: jan only, back in mar (resurrected)
        (3, jan, 2, "e", 0.0, "{}"), (4, mar, 2, "e", 0.0, "{}"),
        # u3: new in feb
        (5, feb, 3, "e", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.month: r for r in monthly_growth_accounting(df).collect()}
    jan_m, feb_m, mar_m = 2024 * 12 + 1, 2024 * 12 + 2, 2024 * 12 + 3
    assert out[jan_m].active == 2 and out[jan_m].new_users == 2
    assert out[feb_m].active == 2 and out[feb_m].new_users == 1
    assert out[feb_m].retained == 1 and out[feb_m].churned == 1  # u2 left
    assert out[mar_m].resurrected == 1 and out[mar_m].retained == 0
    assert out[mar_m].churned == 2  # u1 and u3 both absent in mar
    for r in out.values():
        assert r.active == r.new_users + r.retained + r.resurrected


def test_abc_xyz_classes(spark):
    from mcas_question2_etl_spark.operators.concentration import abc_xyz_matrix

    base = dt.datetime(2024, 1, 1)
    rows = []
    # part 1: huge steady revenue (A/X): 10 weeks x qty 10, price 1000
    for w in range(10):
        rows.append((1, 1000.0, 10.0, base + dt.timedelta(weeks=w)))
    # part 2: small erratic (C/Z): weekly qty {1, 1, 100} -> mean 34,
    # pop sd ~46.7, cv ~1.37 > 1 (a 2-point series can never exceed
    # cv 1, so three weeks are needed to exercise the Z class)
    rows.append((2, 1.0, 1.0, base))
    rows.append((2, 1.0, 1.0, base + dt.timedelta(weeks=3)))
    rows.append((2, 1.0, 100.0, base + dt.timedelta(weeks=5)))
    df = spark.createDataFrame(
        rows, ["l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"]
    )
    out = {
        (r.abc_class, r.xyz_class): r
        for r in abc_xyz_matrix(
            df, "l_partkey", "l_extendedprice", "l_quantity", "l_shipdate"
        ).collect()
    }
    assert ("A", "X") in out and out[("A", "X")].n_keys == 1
    assert ("C", "Z") in out and out[("C", "Z")].n_keys == 1


def test_grid_density_hotspots_ranking(spark):
    from mcas_question2_etl_spark.operators.spatial import grid_density_hotspots

    rows = [(1.0, 1.0)] * 5 + [(11.0, 11.0)] * 3 + [(-20.0, 30.0)] * 1
    df = spark.createDataFrame(rows, ["lat", "lon"])
    out = grid_density_hotspots(df, top_k=2).collect()
    assert len(out) == 2
    assert out[0].n_points >= out[1].n_points
    top = {(r.cell_lat, r.cell_lon): r.rank for r in out}
    assert top[(0, 0)] == 1 and top[(2, 2)] == 2
