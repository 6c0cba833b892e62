"""Wave 168 — mediation analysis (product of coefficients + Sobel).

Hand-pinned two-regression recomputation, recovery of a planted
chain's path coefficients (a = 2, b = 3, c' = 1 within noise;
prop_mediated ~ 6/7; Sobel strongly significant), the no-mediation
null (m independent of x: indirect ~ 0, |sobel| small), and SQL-twin
equality. Spec: mediation_sobel_planted (plans/ops_bi_specs.py),
gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.causal import (
    mediation_sobel,
    mediation_sobel_sql,
)


def _chain(n):
    rows = []
    for k in range(1, n + 1):
        x = k % 7
        m = 2 * x + (k % 5)
        y = 3 * m + x + (k % 11)
        rows.append((float(x), float(m), float(y)))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "x double, m double, y double")


def _hand(rows):
    n = len(rows)
    sx = sum(r[0] for r in rows)
    sm = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    cxx = sum(r[0] ** 2 for r in rows) - sx * sx / n
    cmm = sum(r[1] ** 2 for r in rows) - sm * sm / n
    cyy = sum(r[2] ** 2 for r in rows) - sy * sy / n
    cxm = sum(r[0] * r[1] for r in rows) - sx * sm / n
    cxy = sum(r[0] * r[2] for r in rows) - sx * sy / n
    cmy = sum(r[1] * r[2] for r in rows) - sm * sy / n
    a = cxm / cxx
    se_a = math.sqrt(((cmm - a * cxm) / (n - 2)) / cxx)
    den = cmm * cxx - cxm * cxm
    b = (cmy * cxx - cxy * cxm) / den
    cp = (cxy * cmm - cmy * cxm) / den
    sse = cyy - b * cmy - cp * cxy
    se_b = math.sqrt((sse / (n - 3)) * cxx / den)
    ind = a * b
    z = ind / math.sqrt(b * b * se_a**2 + a * a * se_b**2)
    return a, b, cp, ind, ind / (cp + ind), z


def test_hand_recomputation(spark):
    rows = _chain(400)
    r = mediation_sobel(_df(spark, rows), "x", "m", "y").collect()[0]
    a, b, cp, ind, pm, z = _hand(rows)
    assert r.n == 400
    assert r.a == pytest.approx(round(a, 6), abs=1e-9)
    assert r.b == pytest.approx(round(b, 6), abs=1e-9)
    assert r.c_prime == pytest.approx(round(cp, 6), abs=1e-9)
    assert r.indirect == pytest.approx(round(ind, 6), abs=1e-9)
    assert r.prop_mediated == pytest.approx(round(pm, 6), abs=1e-9)
    assert r.sobel_z == pytest.approx(round(z, 6), abs=1e-6)


def test_planted_path_recovered(spark):
    rows = _chain(7 * 5 * 11 * 3)
    r = mediation_sobel(_df(spark, rows), "x", "m", "y").collect()[0]
    assert r.a == pytest.approx(2.0, abs=0.05)
    assert r.b == pytest.approx(3.0, abs=0.05)
    assert r.c_prime == pytest.approx(1.0, abs=0.15)
    assert r.prop_mediated == pytest.approx(6 / 7, abs=0.03)
    assert r.sobel_z > 20.0


def test_no_mediation_null(spark):
    rows = []
    for k in range(1, 701):
        x = k % 7
        m = (k * 3) % 5  # independent of x
        y = 2 * x + (k % 11)  # y ignores m
        rows.append((float(x), float(m), float(y)))
    r = mediation_sobel(_df(spark, rows), "x", "m", "y").collect()[0]
    assert abs(r.indirect) < 0.05
    assert abs(r.sobel_z) < 2.0


def test_sql_twin_matches_spark_exactly(spark):
    rows = _chain(233)
    r = mediation_sobel(_df(spark, rows), "x", "m", "y").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (x DOUBLE, m DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?)", rows)
    row = con.execute(
        mediation_sobel_sql("SELECT * FROM t0", "x", "m", "y")
    ).fetchone()
    assert row == (
        r.n, r.a, r.b, r.c_prime, r.indirect, r.prop_mediated,
        r.sobel_z,
    )
