"""Wave 124 — HBOS histogram-based outlier scoring.

Hand-pinned tests for operators/hbos.py: a planted outlier in a thin
bin must rank first with the exactly recomputed log-ratio score,
integer bin edges match the closed form, uniform data scores ~0, the
(score desc, id asc) order is total, and the SQL twin matches exactly.
Spec: hbos_order_anomalies (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.hbos import hbos_scores, hbos_scores_sql

BINS = 16


def _df(spark, rows):
    return spark.createDataFrame(rows, "rid long, a long, b long")


def test_planted_outlier_ranks_first_with_exact_score(spark):
    """99 points with a in [0,99] uniform-ish, b constant; one point at
    a=1000 in its own bin. Score recomputed by hand from the bin
    counts."""
    rows = [(i, i, 5) for i in range(99)] + [(99, 1000, 5)]
    out = hbos_scores(_df(spark, rows), "rid", ["a", "b"], bins=BINS).collect()
    top = out[0]
    assert top.rid == 99
    # bins over [0, 1000]: width basis (1000-0+1); the 99 normal points
    # land in bins 0..1 (i*16//1001 = 0 or 1), outlier in bin 15
    cnt = {}
    for _, a, _b in rows:
        cnt[a * BINS // 1001] = cnt.get(a * BINS // 1001, 0) + 1
    cmax = max(cnt.values())
    expected = math.log(cmax / cnt[1000 * BINS // 1001]) + math.log(1.0)
    assert top.hbos_score == pytest.approx(round(expected, 6), abs=1e-9)
    assert top.bin_0 == 1000 * BINS // 1001 and top.bin_1 == 0


def test_uniform_data_scores_zero(spark):
    """Exactly equal bin counts: every log(max/cnt) is log(1) = 0."""
    rows = [(i, i, i % 4) for i in range(64)]
    out = hbos_scores(_df(spark, rows), "rid", ["a"], bins=16).collect()
    assert all(r.hbos_score == 0.0 for r in out)


def test_order_is_total_and_deterministic(spark):
    rows = [(i, i % 10, (i * 7) % 10) for i in range(50)]
    a = hbos_scores(_df(spark, rows), "rid", ["a", "b"], bins=4).collect()
    b = hbos_scores(_df(spark, rows), "rid", ["a", "b"], bins=4).collect()
    assert a == b
    scores_ids = [(r.hbos_score, r.rid) for r in a]
    assert scores_ids == sorted(scores_ids, key=lambda t: (-t[0], t[1]))


def test_sql_twin_matches_spark_exactly(spark):
    rows = [(i, (i * 13) % 37, (i * 5) % 11) for i in range(80)]
    rows.append((80, 500, 3))
    spark_rows = [
        tuple(r) for r in hbos_scores(
            _df(spark, rows), "rid", ["a", "b"], bins=8, top_k=10
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (rid BIGINT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", rows)
    duck_rows = con.execute(
        hbos_scores_sql("SELECT * FROM t0", "rid", ["a", "b"], bins=8, top_k=10)
    ).fetchall()
    assert spark_rows == duck_rows
