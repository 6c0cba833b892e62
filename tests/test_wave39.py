"""Wave-39 tests: entropy identities, rolling-distinct window
semantics, concentration extremes, k-core peel on a known graph, and
trigram counting."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def test_char_entropy_known_values(spark):
    from mcas_question2_etl_spark.operators.entropy import doc_entropy_report

    df = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa"), (4, "x")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in doc_entropy_report(df).collect()}
    assert math.isclose(out[1].char_entropy, math.log(2), rel_tol=1e-12)
    assert math.isclose(out[2].char_entropy, math.log(4), rel_tol=1e-12)
    assert out[3].char_entropy == 0.0  # one symbol, zero surprise
    assert out[4].char_entropy == 0.0  # singleton array
    assert out[1].n_chars_obs == 4


def test_token_entropy_counts_whitespace_tokens(spark):
    from mcas_question2_etl_spark.operators.entropy import doc_entropy_report

    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    row = doc_entropy_report(df).collect()[0]
    assert row.n_tokens == 4
    assert math.isclose(row.token_entropy, math.log(2), rel_tol=1e-12)


def test_rolling_distinct_small_frame(spark):
    from mcas_question2_etl_spark.operators.timeseries import rolling_distinct_count

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base, 1),
        (base, 2),
        (base + dt.timedelta(days=3), 2),
        (base + dt.timedelta(days=10), 3),
    ]
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    out = {r.day.isoformat(): r.n_distinct for r in rolling_distinct_count(df).collect()}
    # observed days only: jan1 {1,2}; jan4 {1,2 (from jan1, within 7d), 2} = {1,2};
    # jan11 {3} (jan4's user 2 is 7 days back = outside the trailing-7 window)
    assert out == {"2024-01-01": 2, "2024-01-04": 2, "2024-01-11": 1}


def test_concentration_extremes(spark):
    from mcas_question2_etl_spark.operators.concentration import group_concentration

    counts = spark.createDataFrame(
        [("uniform", "a", 5), ("uniform", "b", 5), ("uniform", "c", 5),
         ("uniform", "d", 5), ("point", "only", 20)],
        ["source", "term", "n"],
    )
    out = {r.source: r for r in group_concentration(counts).collect()}
    # uniform over 4 classes: HHI = 1/4, Gini = 0
    assert math.isclose(out["uniform"].hhi, 0.25, rel_tol=1e-12)
    assert abs(out["uniform"].gini) < 1e-12
    # single class: HHI = 1, Gini = 0 (no inequality with one class)
    assert math.isclose(out["point"].hhi, 1.0, rel_tol=1e-12)
    assert abs(out["point"].gini) < 1e-12


def test_kcore_peel_path_plus_triangle(spark):
    from mcas_question2_etl_spark.operators.kcore import kcore_peel_report

    # path 1-2-3-4 (degrees 1,2,2,1) + triangle 5-6-7 (degrees 2,2,2)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (5, 7), (6, 7)], ["a", "b"]
    )
    rows = {r.round: r for r in kcore_peel_report(edges, rounds=3).collect()}
    # q25 of degrees [1,1,2,2,2,2,2] = 1.5: endpoints peel, the path
    # then unravels, the triangle is the stable 2-core
    assert (rows[0].n_nodes, rows[0].n_edges) == (7, 6)
    assert (rows[1].n_nodes, rows[1].n_edges) == (5, 4)   # drop 1 and 4
    assert (rows[2].n_nodes, rows[2].n_edges) == (3, 3)   # drop 2 and 3
    assert (rows[3].n_nodes, rows[3].n_edges) == (3, 3)   # fixpoint
    assert rows[0].k_threshold == 1.5


def test_trigram_patterns_counts(spark):
    from mcas_question2_etl_spark.plans.text_analytics import event_trigram_patterns  # noqa: F401
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, t)
        for i, t in enumerate(["a", "b", "c", "a", "b", "c"])
    ] + [(10, base, 2, "x")]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("trigram"))
        .groupBy("trigram")
        .count()
    )
    got = {r.trigram: r["count"] for r in tri.collect()}
    # user 1's sequence a b c a b c -> abc x2, bca, cab; user 2 too short
    assert got == {"a>b>c": 2, "b>c>a": 1, "c>a>b": 1}
