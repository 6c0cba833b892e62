"""Wave 141 — Hoeffding's D test of general dependence.

Hand-pinned tests for operators/evaluation.py hoeffding_d: agreement
with a literal O(n^2) Python replica of the tie-corrected definition,
the monotone case (D > 0), the V-shape case rank correlations miss
(D clearly positive while Spearman ~ 0), near-zero D under designed
independence, and SQL-twin equality. Spec: hoeffding_d_click_purchase
(plans/timeseries_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    hoeffding_d,
    hoeffding_d_sql,
)


def _df(spark, pts):
    return spark.createDataFrame(
        [(int(x), int(y)) for x, y in pts], "x long, y long"
    )


def _hand_d(pts):
    n = len(pts)

    def phi(u, v):
        return 1.0 if u < v else (0.5 if u == v else 0.0)

    d1 = d2 = d3 = 0.0
    for i, (xi, yi) in enumerate(pts):
        q = 1.0 + sum(
            phi(xj, xi) * phi(yj, yi)
            for j, (xj, yj) in enumerate(pts)
            if j != i
        )
        r = 1.0 + sum(
            phi(xj, xi) for j, (xj, yj) in enumerate(pts) if j != i
        ) + 0.0
        r = sum(phi(xj, xi) for j, (xj, _) in enumerate(pts) if j != i)
        s = sum(phi(yj, yi) for j, (_, yj) in enumerate(pts) if j != i)
        R, S = r + 1.0, s + 1.0
        d1 += (q - 1.0) * (q - 2.0)
        d2 += (R - 1.0) * (R - 2.0) * (S - 1.0) * (S - 2.0)
        d3 += (R - 2.0) * (S - 2.0) * (q - 1.0)
    num = 30.0 * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
    den = n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return num / den


def test_matches_literal_definition_with_ties(spark):
    pts = [(1, 2), (2, 4), (2, 4), (3, 1), (4, 7), (5, 7), (6, 3), (7, 9)]
    r = hoeffding_d(_df(spark, pts), "x", "y").collect()[0]
    assert r.n == len(pts)
    assert r.hoeffding_d == pytest.approx(round(_hand_d(pts), 9), abs=1e-12)


def test_monotone_dependence_positive(spark):
    pts = [(i, 3 * i + 1) for i in range(20)]
    r = hoeffding_d(_df(spark, pts), "x", "y").collect()[0]
    assert r.hoeffding_d > 0.2


def test_vshape_detected_where_spearman_blind(spark):
    """y = |x - 10|: Spearman on this symmetric V is ~0, Hoeffding's D
    is clearly positive — the whole reason D exists."""
    pts = [(i, abs(i - 10)) for i in range(21)]
    r = hoeffding_d(_df(spark, pts), "x", "y").collect()[0]
    assert r.hoeffding_d > 0.05


def test_designed_independence_near_zero(spark):
    """A full factorial grid is exactly independent: D ~ 0 (slightly
    negative — the known tie-induced bias; D ranges down to -0.5) and
    far below the dependent cases above."""
    pts = [(i, j) for i in range(8) for j in range(8)]
    r = hoeffding_d(_df(spark, pts), "x", "y").collect()[0]
    assert abs(r.hoeffding_d) < 0.02
    assert r.hoeffding_d == pytest.approx(round(_hand_d(pts), 9), abs=1e-12)


def test_sql_twin_matches_spark_exactly(spark):
    pts = [((i * 13) % 29, (i * 7 + (i * i) % 5) % 23) for i in range(60)]
    r = hoeffding_d(_df(spark, pts), "x", "y").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", pts)
    row = con.execute(
        hoeffding_d_sql("SELECT * FROM t0", "x", "y")
    ).fetchone()
    assert row == (r.n, r.d16_1, r.d16_2, r.d16_3, r.hoeffding_d)
