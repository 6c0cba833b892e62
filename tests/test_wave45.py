"""Wave-45 tests: k-anonymity class math, streak islands, KWIC edge
windows, FD violation detection, key-candidate flags."""

from __future__ import annotations

import datetime as dt
import math


def test_k_anonymity_classes(spark):
    from mcas_question2_etl_spark.operators.privacy import k_anonymity_audit

    rows = [
        # class (1, 'A'): 3 rows, 2 distinct sensitive values
        (1, "A", 10.0), (1, "A", 10.0), (1, "A", 20.0),
        # class (2, 'B'): singleton -> k=1, l=1
        (2, "B", 30.0),
    ]
    df = spark.createDataFrame(rows, ["q1", "q2", "s"])
    out = {r.class_size: r for r in
           k_anonymity_audit(df, ("q1", "q2"), "s").collect()}
    assert out[3].n_classes == 1 and out[3].min_l == 2
    assert out[1].n_classes == 1 and out[1].min_l == 1
    assert math.isclose(out[1].frac_rows, 0.25, rel_tol=1e-12)


def test_activity_streaks(spark):
    from mcas_question2_etl_spark.operators.timeseries import (
        activity_streak_histogram,
    )

    base = dt.datetime(2024, 1, 1, 12)

    def ev(eid, uid, day):
        return (eid, base + dt.timedelta(days=day), uid)

    rows = [
        # u1 active days 0,1,2 and 5 -> longest 3 (two events on day 1
        # must not double-count)
        ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 1), ev(4, 1, 2), ev(5, 1, 5),
        # u2 active day 0 only -> longest 1
        ev(6, 2, 0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {r.streak_days: r.n_keys for r in activity_streak_histogram(df).collect()}
    assert out == {3: 1, 1: 1}


def test_kwic_edges_and_positions(spark):
    from mcas_question2_etl_spark.operators.text import kwic_snippets

    rows = [(1, "spark runs fast"), (2, "we love spark"), (3, "a b spark c d e")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in kwic_snippets(df, "spark").collect()}
    assert out[1].pos == 1 and out[1].snippet == "spark runs fast"
    assert out[2].pos == 3 and out[2].snippet == "we love spark"
    assert out[3].pos == 3 and out[3].snippet == "a b spark c d"


def test_functional_dependency_detects_violation(spark):
    from mcas_question2_etl_spark.operators.profiling import (
        functional_dependency_audit,
    )

    rows = [("b1", "t1"), ("b1", "t1"), ("b2", "t1"), ("b2", "t2")]
    df = spark.createDataFrame(rows, ["brand", "typ"])
    out = {(r.lhs_col, r.rhs_col): r for r in
           functional_dependency_audit(df, [("brand", "typ"), ("typ", "brand")]).collect()}
    fd = out[("brand", "typ")]
    assert not fd.fd_holds and fd.n_violating == 1 and fd.max_rhs_per_class == 2
    rev = out[("typ", "brand")]
    assert not rev.fd_holds and rev.n_classes == 2


def test_key_candidate_flags(spark):
    from mcas_question2_etl_spark.operators.profiling import (
        key_candidate_profile,
    )

    rows = [(1, "x", None), (2, "x", "a"), (3, "y", "b")]
    df = spark.createDataFrame(rows, ["id", "cat", "maybe"])
    out = {r.column_name: r for r in
           key_candidate_profile(df, ("id", "cat", "maybe")).collect()}
    assert out["id"].is_key and math.isclose(out["id"].uniqueness, 1.0)
    assert not out["cat"].is_key and out["cat"].n_distinct == 2
    # distinct excludes nulls -> 2 distinct, 1 null, not a key
    assert not out["maybe"].is_key and out["maybe"].n_nulls == 1
