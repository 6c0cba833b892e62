"""Wave 137 — Page's L ordered-trend test.

Hand-pinned tests for operators/evaluation.py page_trend_test: L and z
recomputed by hand on a small block design, the perfect-monotone
maximum (L = n·Σj·(j) with every block ranking in treatment order),
the reversed-order minimum (z negative), incomplete-block dropping,
and SQL-twin equality. Spec: page_trend_priority_revenue
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    page_trend_test,
    page_trend_test_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "b long, t long, v double")


def _mu_sig(n, k):
    mu = n * k * (k + 1) ** 2 / 4
    sig = math.sqrt(n * k * k * (k + 1) * (k * k - 1) / 144)
    return mu, sig


def test_perfect_monotone_hits_max(spark):
    """Every block orders values exactly with treatment: R_j = n·j, so
    L = n·Σ j² — the distribution's maximum."""
    n, k = 6, 4
    rows = [(b, t, float(10 * t + b)) for b in range(n) for t in range(1, k + 1)]
    r = page_trend_test(_df(spark, rows), "b", "t", "v").collect()[0]
    l_max = n * sum(j * j for j in range(1, k + 1))
    assert (r.n_blocks, r.k_treatments, r.l_stat) == (n, k, l_max)
    mu, sig = _mu_sig(n, k)
    assert r.z_stat == pytest.approx(round((l_max - mu) / sig, 6), abs=1e-9)
    assert r.z_stat > 3


def test_reversed_order_hits_min(spark):
    n, k = 6, 4
    rows = [(b, t, float(-10 * t + b * 0.01)) for b in range(n) for t in range(1, k + 1)]
    r = page_trend_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.z_stat < -3


def test_hand_mixed_design(spark):
    """3 blocks x 3 treatments with one block disagreeing; ranks and L
    recomputed by hand."""
    rows = [
        (1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0),   # ranks 1,2,3
        (2, 1, 2.0), (2, 2, 1.0), (2, 3, 3.0),   # ranks 2,1,3
        (3, 1, 1.0), (3, 2, 3.0), (3, 3, 2.0),   # ranks 1,3,2
    ]
    r = page_trend_test(_df(spark, rows), "b", "t", "v").collect()[0]
    rsums = {1: 1 + 2 + 1, 2: 2 + 1 + 3, 3: 3 + 3 + 2}
    l_hand = sum(j * rs for j, rs in rsums.items())
    assert r.l_stat == l_hand
    mu, sig = _mu_sig(3, 3)
    assert r.z_stat == pytest.approx(round((l_hand - mu) / sig, 6), abs=1e-9)


def test_incomplete_blocks_dropped(spark):
    rows = [
        (1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0),
        (2, 1, 1.0), (2, 2, 2.0),               # missing treatment 3
    ]
    r = page_trend_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 1


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (b, t, float(((b * 7 + t * t * 3) % 11) + t))
        for b in range(10)
        for t in range(1, 6)
    ]
    r = page_trend_test(_df(spark, rows), "b", "t", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (b BIGINT, t BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", rows)
    row = con.execute(
        page_trend_test_sql("SELECT * FROM t0", "b", "t", "v")
    ).fetchone()
    assert row == (r.n_blocks, r.k_treatments, r.l_stat, r.z_stat)
