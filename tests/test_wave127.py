"""Wave 127 — gap-bounded skip-gram sequential patterns.

Hand-pinned tests for operators/markov.py skipgram_patterns: counts on
a tiny two-user stream recomputed by hand, the gap bound, the
beyond-adjacency property (the pattern adjacent transitions cannot
see), per-user stream isolation, and SQL-twin equality. Spec:
skipgram_event_patterns (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from mcas_question2_etl_spark.operators.markov import (
    skipgram_patterns,
    skipgram_patterns_sql,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def _ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)


def test_counts_recomputed_by_hand(spark):
    # user 1: v c v p ; user 2: v v p
    rows = [
        (0, 1, "v", _ts(0)), (1, 1, "c", _ts(1)),
        (2, 1, "v", _ts(2)), (3, 1, "p", _ts(3)),
        (4, 2, "v", _ts(0)), (5, 2, "v", _ts(1)), (6, 2, "p", _ts(2)),
    ]
    out = {
        (r.a, r.b): r
        for r in skipgram_patterns(
            _events(spark, rows), gap=5, top_k=50
        ).collect()
    }
    # user1 windows: v->{c,v,p}, c->{v,p}, v->{p}; user2: v->{v,p}, v->{p}
    assert out[("v", "p")].n_occurrences == 4
    assert out[("v", "v")].n_occurrences == 2
    assert out[("v", "c")].n_occurrences == 1
    assert out[("c", "p")].n_occurrences == 1
    # antecedent totals: v emits 7 pairs, c emits 2
    assert out[("v", "p")].n_antecedent == 7
    assert out[("v", "p")].confidence == pytest.approx(round(4 / 7, 6))
    # lift of v->p: conf / (p-share of all 9 pairs = 5/9)
    assert out[("v", "p")].lift == pytest.approx(
        round((4 / 7) / (5 / 9), 6), abs=1e-9
    )


def test_gap_bound_cuts_far_pairs(spark):
    rows = [(i, 1, t, _ts(i)) for i, t in enumerate("abcdefg")]
    out = {
        (r.a, r.b)
        for r in skipgram_patterns(
            _events(spark, rows), gap=2, top_k=50
        ).collect()
    }
    assert ("a", "b") in out and ("a", "c") in out
    assert ("a", "d") not in out  # 3 steps away, gap=2


def test_sees_beyond_adjacency(spark):
    """'v x x p' has NO adjacent v->p transition but the skip-gram
    window catches it."""
    rows = [
        (0, 1, "v", _ts(0)), (1, 1, "x", _ts(1)),
        (2, 1, "x", _ts(2)), (3, 1, "p", _ts(3)),
    ]
    out = {
        (r.a, r.b)
        for r in skipgram_patterns(
            _events(spark, rows), gap=5, top_k=50
        ).collect()
    }
    assert ("v", "p") in out


def test_streams_are_per_user(spark):
    rows = [(0, 1, "a", _ts(0)), (1, 2, "b", _ts(1))]
    assert skipgram_patterns(_events(spark, rows), top_k=50).count() == 0


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (i, i % 5, "tvcpx"[(i * 7) % 5], _ts(i)) for i in range(120)
    ]
    s = [
        tuple(r)
        for r in skipgram_patterns(
            _events(spark, rows), gap=4, top_k=15
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t0 (event_id BIGINT, user_id BIGINT,"
        " event_type VARCHAR, ts TIMESTAMP)"
    )
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?, ?)", rows)
    d = con.execute(
        skipgram_patterns_sql(
            "SELECT * FROM t0", gap=4, top_k=15
        )
    ).fetchall()
    assert s == d
