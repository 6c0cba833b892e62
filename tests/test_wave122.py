"""Wave 122 — Huber M-estimator robust trend (IRLS, fixed iterations).

Hand-pinned tests for operators/regression.py huber_trend: exact
agreement with a step-by-step NumPy replica of the same fixed-iteration
IRLS (same MAD scale, same weights), outlier-resistance vs OLS, the
clean-data no-downweighting case, and Spark-vs-DuckDB twin equality.
Spec: huber_trend_daily (plans/timeseries_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from mcas_question2_etl_spark.operators import regression as reg

K = 1.345
ITERS = 3


def _daily(spark, ys):
    return spark.createDataFrame(
        [(d, float(v)) for d, v in enumerate(ys)], "day long, y double"
    )


def _numpy_huber(ys, k=K, iters=ITERS):
    y = np.asarray(ys, dtype=float)
    t = np.arange(1, len(y) + 1, dtype=float)
    w = np.ones_like(y)
    b = a = None
    scale = None
    n_down = None
    for it in range(iters + 1):
        sw, st, st2 = w.sum(), (w * t).sum(), (w * t * t).sum()
        sy, sty = (w * y).sum(), (w * t * y).sum()
        det = sw * st2 - st * st
        b = (sw * sty - st * sy) / det
        a = (st2 * sy - st * sty) / det
        if it == iters:
            break
        r = y - a - b * t
        s = 1.4826 * np.median(np.abs(r - np.median(r)))
        w = np.minimum(1.0, k * s / np.abs(r))
        if it == iters - 1:
            scale = s
            n_down = int((w < 1.0).sum())
    return b, a, scale, n_down


def test_matches_numpy_irls_exactly(spark):
    """Even-length series so the interpolated median is exercised."""
    ys = [10.2, 11.1, 11.9, 13.2, 13.8, 95.0, 16.1, 17.0, 17.8, 19.1]
    r = reg.huber_trend(_daily(spark, ys)).collect()[0]
    b, a, s, nd = _numpy_huber(ys)
    assert r.n_days == 10
    assert r.slope_huber == pytest.approx(round(b, 6), abs=1e-9)
    assert r.intercept_huber == pytest.approx(round(a, 6), abs=1e-9)
    assert r.scale_mad == pytest.approx(round(s, 6), abs=1e-9)
    assert r.n_downweighted == nd


def test_outlier_resistance_vs_ols(spark):
    """A single wild day drags OLS visibly but barely moves Huber:
    true slope 1, one +80 outlier at the END of the series (a central
    outlier shifts only the intercept — max slope leverage is at the
    extremes)."""
    ys = [float(i) for i in range(1, 21)]
    ys[19] += 80.0
    r = reg.huber_trend(_daily(spark, ys)).collect()[0]
    assert abs(r.slope_huber - 1.0) < 0.1
    assert abs(r.slope_ols - 1.0) > 0.5
    assert r.n_downweighted >= 1


def test_clean_linear_data_keeps_ols(spark):
    """On exactly linear data residuals are ~0, weights stay 1, and the
    Huber fit IS the OLS fit."""
    ys = [3.0 + 2.0 * i for i in range(1, 13)]
    r = reg.huber_trend(_daily(spark, ys)).collect()[0]
    assert r.slope_huber == pytest.approx(2.0, abs=1e-9)
    assert r.slope_ols == pytest.approx(2.0, abs=1e-9)
    assert r.intercept_huber == pytest.approx(3.0, abs=1e-6)


def test_sql_twin_matches_spark(spark):
    ys = [10.2, 11.1, 11.9, 13.2, 13.8, 95.0, 16.1, 17.0, 17.8, 19.1, 21.3]
    r = reg.huber_trend(_daily(spark, ys)).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (day BIGINT, y DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)", list(enumerate(map(float, ys)))
    )
    row = con.execute(
        reg.huber_trend_sql("SELECT day, y FROM t0")
    ).fetchone()
    assert row == (
        r.n_days, r.slope_ols, r.slope_huber, r.intercept_huber,
        r.scale_mad, r.n_downweighted,
    )
