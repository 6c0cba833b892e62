"""Wave-60 tests: elasticity sign on planted demand curve, funnel
window monotonicity, Gini pins, heatmap accounting."""

from __future__ import annotations

import datetime as dt
import math


def test_funnel_window_monotone(spark, tmp_path):
    from mcas_question2_etl_spark.plans.ops_bi_specs import funnel_window_sensitivity

    base = dt.datetime(2024, 1, 1)
    rows = [
        # u1 converts in 30min; u2 in 48h; u3 never; u4 purchase
        # BEFORE click (not counted)
        (1, base, 1, "click", 0.0, "{}"),
        (2, base + dt.timedelta(minutes=30), 1, "purchase", 0.0, "{}"),
        (3, base, 2, "click", 0.0, "{}"),
        (4, base + dt.timedelta(hours=48), 2, "purchase", 0.0, "{}"),
        (5, base, 3, "click", 0.0, "{}"),
        (6, base, 4, "purchase", 0.0, "{}"),
        (7, base + dt.timedelta(hours=1), 4, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    out = {r.window_hours: r for r in
           funnel_window_sensitivity(spark, path).collect()}
    assert out[1].n_clickers == 4
    assert out[1].n_converted == 1
    assert out[24].n_converted == 1
    assert out[72].n_converted == 2
    assert out[72].conversion_rate >= out[24].conversion_rate >= out[1].conversion_rate


def test_gini_by_period_pins(spark):
    from pyspark.sql import functions as F
    from mcas_question2_etl_spark.operators.concentration import gini_by_period

    base = dt.datetime(2024, 1, 15)
    rows = [
        # Q1: equal spends -> gini 0
        (1, base, 100.0), (2, base, 100.0), (3, base, 100.0), (4, base, 100.0),
        # Q2: one customer takes everything -> gini -> (n-1)/n = 0.75
        (1, base + dt.timedelta(days=80), 0.01),
        (2, base + dt.timedelta(days=80), 0.01),
        (3, base + dt.timedelta(days=80), 0.01),
        (4, base + dt.timedelta(days=80), 10000.0),
    ]
    df = spark.createDataFrame(rows, ["cust", "ts", "price"])
    period = (F.year("ts") * 10 + F.quarter("ts")).cast("bigint")
    out = {r.period: r for r in
           gini_by_period(df, period, "cust", "price").collect()}
    assert math.isclose(out[20241].gini, 0.0, abs_tol=1e-12)
    assert 0.74 < out[20242].gini < 0.7501
    assert out[20241].n_units == 4


def test_dow_hour_heatmap_accounting(spark, tmp_path):
    from mcas_question2_etl_spark.plans.ops_bi_specs import dow_hour_heatmap

    base = dt.datetime(2024, 1, 1, 9)  # Monday 09:00
    rows = []
    for i in range(6):
        rows.append((i + 1, base, 1, "click", 0.0, "{}"))
    rows.append((7, base + dt.timedelta(days=5, hours=5), 1, "click", 0.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")
    out = dow_hour_heatmap(spark, str(tmp_path)).collect()
    cells = {(r.dow, r.hod): r for r in out}
    assert cells[(1, 9)].n == 6  # Monday 9am
    assert cells[(6, 14)].n == 1  # Saturday 14:00
    assert math.isclose(sum(r.share for r in out), 1.0, rel_tol=1e-12)


def test_price_elasticity_recovers_negative_slope(spark, tmp_path):
    from mcas_question2_etl_spark.plans.ops_bi_specs import price_elasticity_by_brand

    base = dt.datetime(2024, 1, 1)
    li_rows, part_rows = [], []
    # brand B1: clean constant-elasticity demand q = 1000 * p^-2
    for pk, price in [(1, 2.0), (2, 4.0), (3, 8.0), (4, 16.0)]:
        q = int(1000 * price ** -2)
        part_rows.append((pk, f"part {pk}", "B1", "T", 1, price))
        li_rows.append((pk, pk, 1, 1, float(q), price * q, 0.0, 0.0,
                        "N", "O", base))
    li = spark.createDataFrame(
        li_rows,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    part = spark.createDataFrame(
        part_rows,
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
         "p_retailprice"],
    )
    li.write.mode("overwrite").parquet(str(tmp_path) + "/lineitem.parquet")
    part.write.mode("overwrite").parquet(str(tmp_path) + "/part.parquet")
    out = price_elasticity_by_brand(spark, str(tmp_path)).collect()
    b1 = [r for r in out if r.p_brand == "B1"][0]
    assert b1.n == 4
    assert -2.2 < b1.slope < -1.8  # elasticity ~ -2 (int-rounded q)
