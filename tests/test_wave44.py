"""Wave-44 tests: attribution window semantics (lookback, ties,
no-touch), reconciliation bucket math, duplicate multiplicities,
feature-hash mass conservation."""

from __future__ import annotations

import datetime as dt


def _ev(eid, uid, minutes, etype):
    return (eid, dt.datetime(2024, 1, 10) + dt.timedelta(minutes=minutes), uid, etype)


def test_last_touch_basic_and_lookback(spark):
    from mcas_question2_etl_spark.operators.attribution import (
        last_touch_attribution,
    )

    rows = [
        # u1: click then purchase 5 min later -> click
        _ev(1, 1, 0, "click"), _ev(2, 1, 5, "purchase"),
        # u2: view 10 days before purchase -> outside 7d lookback -> none
        _ev(3, 2, 0, "view"), _ev(4, 2, 10 * 24 * 60, "purchase"),
        # u3: purchase with no prior events -> none
        _ev(5, 3, 0, "purchase"),
        # u4: view then click (later) then purchase -> click (last touch)
        _ev(6, 4, 0, "view"), _ev(7, 4, 1, "click"), _ev(8, 4, 2, "purchase"),
        # u5: prior purchase then view then purchase -> view (conversions
        # are never touches)
        _ev(9, 5, 0, "purchase"), _ev(10, 5, 1, "view"), _ev(11, 5, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.channel: r.n_conversions for r in last_touch_attribution(df).collect()}
    assert out == {"click": 2, "none": 3, "view": 1}


def test_last_touch_same_instant_tiebreak(spark):
    from mcas_question2_etl_spark.operators.attribution import (
        last_touch_attribution,
    )

    # click and view at the SAME instant before purchase: event_id order
    # makes view (id 2) the later touch
    rows = [_ev(1, 1, 0, "click"), _ev(2, 1, 0, "view"), _ev(3, 1, 1, "purchase")]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r.channel: r.n_conversions for r in last_touch_attribution(df).collect()}
    assert out == {"view": 1}


def test_reconciliation_buckets(spark):
    from mcas_question2_etl_spark.operators.reconcile import (
        order_total_reconciliation,
    )

    orders = spark.createDataFrame(
        [(1, 110.0), (2, 100.5), (3, 200.0), (4, 50.0)],
        ["o_orderkey", "o_totalprice"],
    )
    # order 1: lines recompute to exactly 110; order 2: recompute 100.0
    # (diff 0.5 -> lt_1); order 3: recompute 100 (diff 100 -> gte_1);
    # order 4: no lines
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.10),   # 100 * 1.10 = 110.00
            (2, 100.0, 0.0, 0.0),
            (3, 100.0, 0.0, 0.0),
        ],
        ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )
    out = {r.bucket: r for r in order_total_reconciliation(orders, li).collect()}
    assert out["exact"].n_orders == 1
    assert out["lt_1"].n_orders == 1 and abs(out["lt_1"].total_abs_diff - 0.5) < 1e-9
    assert out["gte_1"].n_orders == 1 and abs(out["gte_1"].total_abs_diff - 100.0) < 1e-9
    assert out["no_lines"].n_orders == 1


def test_duplicate_audit_multiplicity(spark):
    from mcas_question2_etl_spark.operators.reconcile import (
        duplicate_transaction_audit,
    )

    d = dt.datetime(2024, 3, 1)
    rows = [
        (1, 9.99, d), (1, 9.99, d),            # dup pair
        (1, 9.99, d + dt.timedelta(days=1)),   # other day -> singleton
        (2, 9.99, d),                          # other customer -> singleton
    ]
    df = spark.createDataFrame(rows, ["o_custkey", "o_totalprice", "o_orderdate"])
    out = {r.multiplicity: r for r in duplicate_transaction_audit(df).collect()}
    assert out[2].n_groups == 1 and out[2].n_rows == 2
    assert out[1].n_groups == 2


def test_feature_hash_mass_conserved(spark):
    from mcas_question2_etl_spark.operators.text import feature_hash_report

    rows = [(1, "a b a c"), (2, "a d e f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = feature_hash_report(df, n_buckets=4).collect()
    # 6 distinct tokens, 8 occurrences, conserved across the histogram
    assert sum(r.n_tokens for r in out) == 6
    assert sum(r.token_mass for r in out) == 8
    assert sum(r.n_buckets for r in out) <= 4
