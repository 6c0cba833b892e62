"""Wave-38 tests: DSIR weights, count-min one-sidedness, bloom
no-false-negatives, per-domain cap determinism, CUSUM on a step
series, OOF-encoding leakage-freedom."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_dsir_english_docs_score_higher(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.dsir import dsir_log_weights

    docs = load_table(spark, SF_SMALL, "documents")
    w = dsir_log_weights(docs, F.col("lang") == "en")
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.lang: r.m
        for r in joined.groupBy("lang")
        .agg((F.sum("logw") / F.sum("n_tokens")).alias("m"))
        .collect()
    }
    # the target slice must look more target-like than every other slice
    assert all(means["en"] > means[lg] for lg in means if lg != "en")


def test_countmin_never_underestimates(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.sketches import countmin_estimate

    events = load_table(spark, SF_SMALL, "events")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = countmin_estimate(events, exact.select("user_id"), "user_id")
    rows = exact.join(est, "user_id").collect()
    assert rows and all(r.cm_est >= r.exact for r in rows)


def test_countmin_narrow_width_still_one_sided(spark):
    from mcas_question2_etl_spark.operators.sketches import countmin_estimate

    df = spark.createDataFrame(
        [(i % 7,) for i in range(700)], "k long"
    )
    keys = df.select("k").distinct()
    rows = countmin_estimate(df, keys, "k", depth=2, width=4).collect()
    # heavy collisions at width 4: estimates inflate but never deflate
    assert all(r.cm_est >= 100 for r in rows)


def test_bloom_prefilter_has_no_false_negatives(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.bloomjoin import bloom_prefilter

    orders = load_table(spark, SF_SMALL, "orders")
    cust = load_table(spark, SF_SMALL, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    passed = bloom_prefilter(orders, cust, "o_custkey", "c_custkey")
    true = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        "o_custkey",
        "left_semi",
    )
    # every true match must survive the prefilter
    assert true.join(passed, orders.columns, "left_anti").count() == 0
    # and the filter must actually filter (probe set shrinks)
    assert passed.count() < orders.count()


def test_cap_per_group_bounds_and_determinism(spark):
    from mcas_question2_etl_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)], "k long, g string"
    )
    kept1 = {tuple(r) for r in cap_per_group(df, ["g"], "k", 5).collect()}
    kept2 = {
        tuple(r)
        for r in cap_per_group(df.repartition(13), ["g"], "k", 5).collect()
    }
    assert kept1 == kept2  # membership survives repartitioning
    sizes = {}
    for k, g in kept1:
        sizes[g] = sizes.get(g, 0) + 1
    assert all(v == 5 for v in sizes.values())


def test_cusum_finds_planted_step(spark):
    from mcas_question2_etl_spark.operators.timeseries import cusum_changepoint

    base = dt.date(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=i), 10.0 if i < 40 else 14.0)
        for i in range(80)
    ]
    daily = spark.createDataFrame(rows, "day date, daily_mean double")
    r = cusum_changepoint(daily).first()
    # |S_t| peaks at the last pre-step day
    assert r.cp_date == base + dt.timedelta(days=39)
    assert abs(r.pre_mean - 10.0) < 1e-6
    assert abs(r.post_mean - 14.0) < 1e-6
    assert r.n_days == 80


def test_oof_encoding_excludes_own_fold(spark):
    from mcas_question2_etl_spark.operators.encoding import oof_target_encoding
    from mcas_question2_etl_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(200)],
        "k long, lvl string, y double",
    )
    enc = {
        (r.lvl, r.fold): r.oof_mean
        for r in oof_target_encoding(df, "lvl", "y", "k", n_folds=4).collect()
    }
    rows = df.withColumn("fold", hash_bucket("k", 4).cast("int")).collect()
    for lvl, fold in enc:
        others = [r.y for r in rows if r.lvl == lvl and r.fold != fold]
        assert abs(enc[(lvl, fold)] - round(sum(others) / len(others), 6)) < 1e-6
