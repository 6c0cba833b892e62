"""Wave 138 — Theta method forecast.

Hand-pinned tests for operators/timeseries.py theta_forecast: the
theta-2 line and SES recursion replayed step by step, the exact-linear
degenerate case (theta-2 line collapses onto the data, forecast = trend
point), curvature sensitivity, and SQL-twin equality. Spec:
theta_forecast_daily (plans/timeseries_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    theta_forecast,
    theta_forecast_sql,
)

ALPHA = 0.3


def _daily(spark, ys):
    return spark.createDataFrame(
        [(d, float(v)) for d, v in enumerate(ys)], "day long, y double"
    )


def _hand(ys, a=ALPHA):
    n = len(ys)
    ts = list(range(1, n + 1))
    st, st2, sy = sum(ts), sum(t * t for t in ts), sum(ys)
    sty = sum(t * v for t, v in zip(ts, ys))
    b = (sty - st * sy / n) / (st2 - st * st / n)
    a0 = (sy - b * st) / n
    z = [2 * v - (a0 + b * t) for t, v in zip(ts, ys)]
    l, e = z[0], 0.0
    for zz in z[1:]:
        e += abs(zz - l)
        l = a * zz + (1 - a) * l
    fc = 0.5 * (l + (a0 + b * (n + 1)))
    return b, a0, l, fc, e / (n - 1)


def test_recursion_replayed_by_hand(spark):
    ys = [10.5, 12.0, 11.2, 14.8, 13.9, 16.1, 15.2, 18.4, 17.9, 20.3]
    r = theta_forecast(_daily(spark, ys)).collect()[0]
    b, a0, l, fc, mae = _hand(ys)
    assert r.n_days == 10
    assert r.slope == pytest.approx(round(b, 6), abs=1e-9)
    assert r.ses_theta2 == pytest.approx(round(l, 6), abs=1e-9)
    assert r.forecast_next == pytest.approx(round(fc, 6), abs=1e-9)
    assert r.mae_backtest == pytest.approx(round(mae, 6), abs=1e-9)


def test_exact_linear_series_forecast_is_trend_point(spark):
    """On y = 3 + 2t the theta-2 line equals the data equals the
    trend, SES of a line lags but the COMBINation still lands near the
    next trend point; with zero residuals z_t = y_t so forecast =
    0.5*(SES(y) + trend(n+1)) — recompute by hand."""
    ys = [3.0 + 2.0 * t for t in range(1, 13)]
    r = theta_forecast(_daily(spark, ys)).collect()[0]
    b, a0, l, fc, mae = _hand(ys)
    assert r.slope == pytest.approx(2.0, abs=1e-9)
    assert r.forecast_next == pytest.approx(round(fc, 6), abs=1e-9)


def test_curvature_moves_theta2_not_trend(spark):
    """Adding a late-sample bump moves the SES(theta-2) level far more
    than the global slope."""
    base = [100.0 + t for t in range(1, 31)]
    bump = list(base)
    for i in range(25, 30):
        bump[i] += 40.0
    rb = theta_forecast(_daily(spark, base)).collect()[0]
    rz = theta_forecast(_daily(spark, bump)).collect()[0]
    assert abs(rz.ses_theta2 - rb.ses_theta2) > 10 * abs(rz.slope - rb.slope)


def test_sql_twin_matches_spark_exactly(spark):
    ys = [50.0 + 3.0 * t + ((t * 13) % 7) for t in range(1, 41)]
    r = theta_forecast(_daily(spark, ys)).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (day BIGINT, y DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)", list(enumerate(map(float, ys)))
    )
    row = con.execute(
        theta_forecast_sql("SELECT day, y FROM t0")
    ).fetchone()
    assert row == (
        r.n_days, r.slope, r.intercept, r.ses_theta2, r.forecast_next,
        r.mae_backtest,
    )
