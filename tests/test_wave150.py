"""Wave 150 — just-identified IV / two-stage least squares.

Hand-pinned moment recomputation, the de-biasing property on a planted
confounded system (beta_ols biased, beta_iv recovers the structural
effect), first-stage-F sanity, and SQL-twin equality. Spec:
iv_planted_order_system (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.causal import iv_2sls, iv_2sls_sql


def _df(spark, rows):
    return spark.createDataFrame(
        [(float(y), float(x), float(z)) for y, x, z in rows],
        "y double, x double, z double",
    )


def _planted(n):
    rows = []
    for k in range(1, n + 1):
        z = k % 7
        u = k % 5
        x = z + 2 * u
        y = 2 * x + 5 * u + (k % 11)
        rows.append((y, x, z))
    return rows


def _hand(rows):
    n = len(rows)
    sy = sum(r[0] for r in rows)
    sx = sum(r[1] for r in rows)
    sz = sum(r[2] for r in rows)
    cxx = sum(r[1] ** 2 for r in rows) - sx * sx / n
    cyy = sum(r[0] ** 2 for r in rows) - sy * sy / n
    czz = sum(r[2] ** 2 for r in rows) - sz * sz / n
    cxy = sum(r[1] * r[0] for r in rows) - sx * sy / n
    czx = sum(r[2] * r[1] for r in rows) - sz * sx / n
    czy = sum(r[2] * r[0] for r in rows) - sz * sy / n
    beta_ols = cxy / cxx
    beta_iv = czy / czx
    alpha = sy / n - beta_iv * sx / n
    b1 = czx / czz
    fs_f = b1 * b1 * czz / ((cxx - b1 * b1 * czz) / (n - 2))
    su2 = (cyy - 2 * beta_iv * cxy + beta_iv**2 * cxx) / (n - 2)
    t_iv = beta_iv / math.sqrt(su2 * czz / (czx * czx))
    return beta_ols, beta_iv, alpha, fs_f, t_iv


def test_hand_recomputation(spark):
    rows = _planted(200)
    r = iv_2sls(_df(spark, rows), "y", "x", "z").collect()[0]
    b_ols, b_iv, a, f, t = _hand(rows)
    assert r.n == 200
    assert r.beta_ols == pytest.approx(round(b_ols, 6), abs=1e-9)
    assert r.beta_iv == pytest.approx(round(b_iv, 6), abs=1e-9)
    assert r.alpha_iv == pytest.approx(round(a, 6), abs=1e-9)
    assert r.first_stage_f == pytest.approx(round(f, 6), abs=1e-6)
    assert r.t_iv == pytest.approx(round(t, 6), abs=1e-6)


def test_iv_debiases_planted_confounding(spark):
    """True structural effect is 2; the confounder u enters x with
    weight 2 and y with weight 5, biasing OLS upward. IV through the
    exogenous z recovers ~2."""
    rows = _planted(7 * 5 * 11 * 4)  # full cycles -> clean moments
    r = iv_2sls(_df(spark, rows), "y", "x", "z").collect()[0]
    assert r.beta_ols > 2.5  # visibly biased
    assert r.beta_iv == pytest.approx(2.0, abs=0.05)
    assert r.first_stage_f > 100.0  # strong instrument by design


def test_sql_twin_matches_spark_exactly(spark):
    rows = _planted(173)
    r = iv_2sls(_df(spark, rows), "y", "x", "z").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (y DOUBLE, x DOUBLE, z DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?, ?)",
        [(float(a), float(b), float(c)) for a, b, c in rows],
    )
    row = con.execute(
        iv_2sls_sql("SELECT * FROM t0", "y", "x", "z")
    ).fetchone()
    assert row == (
        r.n, r.beta_ols, r.beta_iv, r.alpha_iv, r.first_stage_f, r.t_iv
    )
