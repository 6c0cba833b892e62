"""Wave-51 tests: JW textbook pins + block completeness, moments on a
known distribution, PMI hand table, vocab growth accounting, decay
math."""

from __future__ import annotations

import datetime as dt
import math


def test_jaro_winkler_textbook_values(spark):
    from mcas_question2_etl_spark.operators.editjoin import jaro_winkler_pairs

    df = spark.createDataFrame(
        [(1, "MARTHA"), (2, "MARHTA"), (3, "DWAYNE"), (4, "DUANE")],
        ["id", "name"],
    )
    # block on a constant so all pairs are candidates
    from pyspark.sql import functions as F

    out = {
        (r.id_a, r.id_b): r.jw
        for r in jaro_winkler_pairs(
            df.withColumn("blk", F.lit("b")), "id", "name",
            block_col="blk", threshold=0.0,
        ).collect()
    }
    # MARTHA/MARHTA jaro = 0.94444..., winkler prefix 3 -> 0.961111111
    assert math.isclose(out[(1, 2)], 0.961111111, abs_tol=1e-9)
    assert math.isclose(out[(3, 4)], 0.84, abs_tol=1e-9)


def test_jaro_winkler_block_restricts_pairs(spark):
    from mcas_question2_etl_spark.operators.editjoin import jaro_winkler_pairs

    df = spark.createDataFrame(
        [(1, "red apple"), (2, "red apples"), (3, "blue apple")],
        ["id", "name"],
    )
    out = jaro_winkler_pairs(df, "id", "name", threshold=0.0).collect()
    # first-token block: only (1,2) share "red"
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}
    assert all(r.jw > 0.9 for r in out)


def test_moments_known_distribution(spark):
    from mcas_question2_etl_spark.operators.profiling import (
        integer_moments_profile,
    )

    # symmetric {1,2,2,3}: mean 2, m2 = 0.5, skew 0, kurtosis of this
    # discrete triangle: m4 = 0.5 -> g2 = 0.5/0.25 - 3 = -1
    rows = [("g", v) for v in (1, 2, 2, 3)]
    df = spark.createDataFrame(rows, ["s", "v"])
    out = integer_moments_profile(df, "s", "v").collect()[0]
    assert math.isclose(out.mean, 2.0, rel_tol=1e-12)
    assert math.isclose(out.stddev_pop, math.sqrt(0.5), rel_tol=1e-12)
    assert math.isclose(out.skewness, 0.0, abs_tol=1e-12)
    assert math.isclose(out.excess_kurtosis, -1.0, rel_tol=1e-12)


def test_moments_constant_guard(spark):
    from mcas_question2_etl_spark.operators.profiling import (
        integer_moments_profile,
    )

    df = spark.createDataFrame([("g", 7)] * 5, ["s", "v"])
    out = integer_moments_profile(df, "s", "v").collect()[0]
    assert out.skewness == 0.0 and out.excess_kurtosis == 0.0
    assert out.stddev_pop == 0.0


def test_pmi_hand_table(spark):
    from mcas_question2_etl_spark.operators.text import pmi_cooccurrence_pairs

    # 10 docs: "a b" x6, "a c" x2, "b c" x2 -> c_a=8, c_b=8, c_c=4
    rows = (
        [(i, "a b") for i in range(6)]
        + [(i + 6, "a c") for i in range(2)]
        + [(i + 8, "b c") for i in range(2)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.token_a, r.token_b): r
        for r in pmi_cooccurrence_pairs(df, min_pairs=1).collect()
    }
    ab = out[("a", "b")]
    assert ab.n_a == 8 and ab.n_b == 8 and ab.n_ab == 6
    assert math.isclose(ab.pmi, round(math.log(6 * 10 / 64), 9), rel_tol=1e-9)


def test_vocab_growth_accounting(spark):
    from mcas_question2_etl_spark.operators.text import vocab_growth_curve

    # ids 0..9, doc i contributes token "t<i//2>": vocab saturates at 5
    rows = [(i, f"t{i // 2} common") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.bucket: r for r in vocab_growth_curve(df).collect()}
    # 10 buckets of width 1
    assert out[9].n_docs_cum == 10
    assert out[9].vocab_cum == 6  # t0..t4 + "common"
    assert out[0].n_docs_cum == 1 and out[0].vocab_cum == 2
    assert out[9].id_hi == 9
    # monotone curves
    for b in range(1, 10):
        assert out[b].vocab_cum >= out[b - 1].vocab_cum


def test_decayed_popularity_math(spark):
    from mcas_question2_etl_spark.operators.timeseries import decayed_popularity

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 4 events 7 days before max day, 3 events on max day
    for _ in range(4):
        eid += 1
        rows.append((eid, base, 1, "x"))
    for _ in range(3):
        eid += 1
        rows.append((eid, base + dt.timedelta(days=7), 1, "x"))
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = decayed_popularity(df, half_life_days=7).collect()[0]
    assert out.total_events == 7 and out.n_days == 2
    assert math.isclose(out.decayed_score, round(3 + 4 * 0.5, 6), rel_tol=1e-9)


def test_jaro_winkler_kernel_runs_once_per_pair(spark):
    """Plan audit (ADVICE r3): the threshold filter must not re-evaluate
    the Arrow kernel by being pushed below the scoring projection. The
    materialization barrier keeps exactly ONE ArrowEvalPython stage in
    the physical plan."""
    from mcas_question2_etl_spark.operators.editjoin import jaro_winkler_pairs

    # same first token so all three share one block; only (1,2) scores
    # above threshold (jw 0.98333 vs 0.68182 for the JONES pairs)
    df = spark.createDataFrame(
        [(1, "SMITH MARTHA"), (2, "SMITH MARHTA"), (3, "SMITH JONES")],
        ["id", "name"],
    )
    out = jaro_winkler_pairs(df, "id", "name", threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 1
    # and the result is still correct after the barrier
    rows = out.collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
