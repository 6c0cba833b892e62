"""Wave-47 tests: shoelace on known shapes, burstiness buckets for
regular vs bursty series, interarrival median pick, assortativity on
star vs clique, quantile-normalize known mapping."""

from __future__ import annotations

import datetime as dt
import math


def test_shoelace_known_square_and_degenerates(spark):
    from mcas_question2_etl_spark.operators.spatial import shoelace_area_centroid

    rows = [
        (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),       # CCW square
        (2, "POLYGON ((0 0, 0 0, 0 0, 0 0))"),                # degenerate
        (3, "POLYGON ((0 0, 10 10, 10 0, 0 10, 0 0))"),       # bowtie
    ]
    df = spark.createDataFrame(rows, ["n_nationkey", "wkt"])
    out = {r.n_nationkey: r for r in shoelace_area_centroid(df, "wkt").collect()}
    assert out[1].area2 == 200  # 2 * 100
    assert math.isclose(out[1].cx, 5.0, rel_tol=1e-12)
    assert math.isclose(out[1].cy, 5.0, rel_tol=1e-12)
    assert out[2].area2 == 0 and out[2].cx is None
    assert out[3].area2 == 0 and out[3].cy is None


def test_burstiness_buckets(spark):
    from mcas_question2_etl_spark.operators.timeseries import (
        user_burstiness_histogram,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: perfectly regular (gap 60s) -> sigma 0 -> B = -1 -> bucket 0
    for i in range(10):
        rows.append((100 + i, base + dt.timedelta(minutes=i), 1))
    # user 2: bursts (9 gaps: eight 1s, one 10000s) -> B near +...
    t = base
    for i in range(9):
        t = t + dt.timedelta(seconds=1)
        rows.append((200 + i, t, 2))
    rows.append((299, t + dt.timedelta(seconds=10000), 2))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {r.burst_bucket: r.n_keys for r in
           user_burstiness_histogram(df, min_gaps=5).collect()}
    assert out.get(0) == 1          # the metronome
    assert sum(out.values()) == 2   # both users kept
    assert max(out) >= 5            # the bursty one lands in the upper half


def test_interarrival_median_pick(spark):
    from mcas_question2_etl_spark.operators.timeseries import interarrival_profile

    base = dt.datetime(2024, 1, 1)
    # gaps for type x: 1s, 2s, 100s -> lower median (n=3 -> rank 2) = 2s
    times = [0, 1, 3, 103]
    rows = [(i, base + dt.timedelta(seconds=s), 1, "x") for i, s in enumerate(times)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = interarrival_profile(df).collect()[0]
    assert out.n_gaps == 3
    assert out.median_gap_us == 2_000_000
    assert math.isclose(out.mean_gap_us, (1 + 2 + 100) / 3 * 1e6, rel_tol=1e-12)


def test_assortativity_star_negative_clique_positive(spark):
    from mcas_question2_etl_spark.operators.graph_metrics import (
        degree_assortativity,
    )

    # star: hub 0 to leaves 1..4 -> perfectly disassortative (r = -1)
    star = spark.createDataFrame([(0, i) for i in range(1, 5)], ["a", "b"])
    r = degree_assortativity(star).collect()[0]
    assert math.isclose(r.assortativity, -1.0, rel_tol=1e-9)
    # clique K4: all degrees equal -> zero variance -> defined 0.0
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], ["a", "b"]
    )
    r2 = degree_assortativity(k4).collect()[0]
    assert r2.assortativity == 0.0 and r2.n_edges == 12


def test_quantile_normalize_known_mapping(spark):
    from mcas_question2_etl_spark.operators.encoding import quantile_normalize

    # group A values (1, 2), group B values (10, 20): pooled sorted
    # (1, 2, 10, 20); rank 1 of 2 -> idx 1, rank 2 -> idx 4
    rows = [("A", 1, 1), ("A", 2, 2), ("B", 10, 3), ("B", 20, 4)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    out = {r.id: r.normalized for r in
           quantile_normalize(df, "g", "v", "id").collect()}
    assert out == {1: 1, 2: 20, 3: 1, 4: 20}
