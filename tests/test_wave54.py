"""Wave-54 tests: haversine known distances + NN pick, triple counts,
LTV accounting, fingerprint clustering, skew accounting."""

from __future__ import annotations

import datetime as dt
import math


def test_haversine_known_distance(spark):
    from pyspark.sql import functions as F
    from mcas_question2_etl_spark.operators.spatial import haversine_m

    # one degree of latitude ~ 111.19 km on the mean-radius sphere
    df = spark.createDataFrame([(0.0, 0.0, 1.0, 0.0)], ["a", "b", "c", "d"])
    out = df.select(
        haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).collect()[0]
    assert math.isclose(out.m, 6371008.8 * math.pi / 180, rel_tol=1e-9)
    # zero distance
    out0 = df.select(
        haversine_m(F.col("a"), F.col("b"), F.col("a"), F.col("b")).alias("m")
    ).collect()[0]
    assert out0.m == 0.0


def test_nearest_neighbor_picks_closest_with_tiebreak(spark):
    from mcas_question2_etl_spark.operators.spatial import nearest_neighbor_join

    points = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 10.0, 10.0)], ["pid", "lat", "lon"]
    )
    # sites 100 and 200 equidistant from point 1 -> smaller id wins
    sites = spark.createDataFrame(
        [(100, 0.0, 1.0), (200, 0.0, -1.0), (300, 10.0, 10.5)],
        ["sid", "lat", "lon"],
    )
    out = {
        r.pid: r
        for r in nearest_neighbor_join(points, sites, "pid", "sid").collect()
    }
    assert out[1].sid == 100
    assert out[2].sid == 300


def test_frequent_triples_hand_counts(spark):
    from mcas_question2_etl_spark.operators.assoc import frequent_triples

    rows = [
        ("b1", "x"), ("b1", "y"), ("b1", "z"),
        ("b2", "x"), ("b2", "y"), ("b2", "z"), ("b2", "w"),
        ("b3", "x"), ("b3", "y"),
    ]
    df = spark.createDataFrame(rows, ["bk", "i"])
    out = {
        (r.item_a, r.item_b, r.item_c): r
        for r in frequent_triples(df, ["bk"], "i", min_support=2).collect()
    }
    # only (x,y,z) appears twice (b1, b2); b2's other triples once
    assert list(out) == [("x", "y", "z")]
    assert out[("x", "y", "z")].n_baskets == 2
    assert math.isclose(out[("x", "y", "z")].support_frac, 2 / 3, rel_tol=1e-12)


def test_cohort_ltv_accounting(spark):
    from mcas_question2_etl_spark.operators.segmentation import cohort_ltv_curve

    jan, feb = dt.datetime(2024, 1, 15), dt.datetime(2024, 2, 15)
    rows = [
        # user 1 joins Jan: 10 in Jan, 5 in Feb; user 2 joins Jan: 20 Jan
        (1, jan, 1, "e", 10.0, "{}"),
        (2, feb, 1, "e", 5.0, "{}"),
        (3, jan, 2, "e", 20.0, "{}"),
        # user 3 joins Feb: 7 in Feb
        (4, feb, 3, "e", 7.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {
        (r.cohort_month, r.months_since): r
        for r in cohort_ltv_curve(df).collect()
    }
    jan_m = 2024 * 12 + 1
    feb_m = 2024 * 12 + 2
    assert out[(jan_m, 0)].month_value == 30.0
    assert out[(jan_m, 1)].month_value == 5.0
    assert out[(jan_m, 1)].cum_value == 35.0
    assert out[(jan_m, 0)].n_users == 2
    assert out[(feb_m, 0)].month_value == 7.0 and out[(feb_m, 0)].n_users == 1


def test_fingerprint_clusters_case_and_order(spark):
    from mcas_question2_etl_spark.operators.text import fingerprint_clusters

    df = spark.createDataFrame(
        [
            (1, "General Electric Co"),
            (2, "co GENERAL electric"),
            (3, "electric general co"),
            (4, "Acme Corp"),
        ],
        ["id", "name"],
    )
    out = fingerprint_clusters(df, "id", "name").collect()
    assert len(out) == 1
    r = out[0]
    assert r.fingerprint == "co electric general"
    assert r.n_rows == 3 and r.n_spellings == 3 and r.min_id == 1


def test_partition_skew_accounting(spark):
    from mcas_question2_etl_spark.operators.profiling import (
        partition_skew_report,
    )

    rows = [(k,) for k in range(100) for _ in range(2)] + [(7,)] * 200
    df = spark.createDataFrame(rows, ["k"])
    out = partition_skew_report(df, "k", buckets=8).collect()
    assert sum(r.n_rows for r in out) == 400
    hot = max(out, key=lambda r: r.n_rows)
    assert hot.top_key_rows == 202  # key 7's bucket dominated by one key
    avg = 400 / len(out)
    assert math.isclose(hot.skew_ratio, hot.n_rows / avg, rel_tol=1e-12)


def test_bucketed_nn_equals_broadcast_nn(spark):
    """Round 4: the grid-bucketed scale path must produce EXACTLY the
    broadcast form's assignments (same rounding, same tie-break),
    including points whose 3x3 neighborhood is empty (fallback path)."""
    from mcas_question2_etl_spark.operators.spatial import (
        nearest_neighbor_join,
        nearest_neighbor_join_bucketed,
    )

    # sparse sites: several points land in empty neighborhoods at
    # cell_deg=5, exercising the residual fallback
    pts = spark.createDataFrame(
        [(i, ((i * 37) % 120) / 2.0 - 30.0, ((i * 73) % 720) / 2.0 - 180.0)
         for i in range(60)],
        ["pid", "lat", "lon"],
    )
    sites = spark.createDataFrame(
        [(j, ((j * 41) % 100) / 2.0 - 25.0, ((j * 79) % 680) / 2.0 - 170.0)
         for j in range(4)],
        ["sid", "lat", "lon"],
    )
    a = nearest_neighbor_join(pts, sites, "pid", "sid")
    b = nearest_neighbor_join_bucketed(pts, sites, "pid", "sid", cell_deg=5.0)
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    assert ra == rb
    assert len(ra) == 60


def test_bucketed_nn_antimeridian_wrap(spark):
    """Longitude wraparound: a point at lon 179.9 must see a site at
    lon -179.9 through the wrapped neighbor cell."""
    from mcas_question2_etl_spark.operators.spatial import (
        nearest_neighbor_join_bucketed,
    )

    pts = spark.createDataFrame([(1, 0.0, 179.9)], ["pid", "lat", "lon"])
    sites = spark.createDataFrame(
        [(10, 0.0, -179.9), (20, 0.0, 150.0)], ["sid", "lat", "lon"]
    )
    out = nearest_neighbor_join_bucketed(
        pts, sites, "pid", "sid", cell_deg=15.0
    ).collect()
    assert out[0].sid == 10  # the across-the-seam site wins
