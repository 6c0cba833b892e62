"""Wave 126 — split conformal prediction interval for the daily trend.

Hand-pinned tests for operators/regression.py conformal_trend_interval:
the chronological split boundaries, the exact finite-sample order
statistic, a coverage guarantee check on a well-behaved series, q_hat
growth under a noisier calibration window, and SQL-twin equality.
Spec: conformal_trend_daily (plans/timeseries_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators import regression as reg


def _daily(spark, ys):
    return spark.createDataFrame(
        [(d, float(v)) for d, v in enumerate(ys)], "day long, y double"
    )


def _mk_series(n, noise_fn):
    return [100.0 + 2.0 * t + noise_fn(t) for t in range(1, n + 1)]


def test_split_boundaries_and_order_statistic(spark):
    """n=40: fit t=1..20, calibrate t=21..30, test t=31..40; with
    alpha=0.1 the quantile is the ceil(0.9*11)=10-th of 10 ordered
    calibration scores — recomputed by hand."""
    ys = _mk_series(40, lambda t: ((t * 7) % 5) - 2.0)
    r = reg.conformal_trend_interval(_daily(spark, ys), alpha=0.1).collect()[0]
    assert (r.n_fit, r.n_cal, r.n_test) == (20, 10, 10)
    # hand OLS on the fit half
    ts = list(range(1, 21))
    fit_ys = ys[:20]
    n = 20.0
    st, st2 = sum(ts), sum(t * t for t in ts)
    sy, sty = sum(fit_ys), sum(t * v for t, v in zip(ts, fit_ys))
    b = (sty - st * sy / n) / (st2 - st * st / n)
    a = (sy - b * st) / n
    cal_scores = sorted(
        abs(ys[t - 1] - a - b * t) for t in range(21, 31)
    )
    k = min(math.ceil(0.9 * 11), 10)
    assert r.q_hat == pytest.approx(round(cal_scores[k - 1], 6), abs=1e-9)
    assert r.slope == pytest.approx(round(b, 6), abs=1e-9)
    covered = sum(
        1 for t in range(31, 41) if abs(ys[t - 1] - a - b * t) <= cal_scores[k - 1]
    )
    assert r.coverage_test == pytest.approx(covered / 10.0, abs=1e-9)


def test_coverage_guarantee_on_stationary_noise(spark):
    """Bounded deterministic noise, long series: empirical coverage on
    the test window must be near-or-above 1-alpha (the conformal
    guarantee is marginal, so allow modest slack)."""
    ys = _mk_series(200, lambda t: math.sin(t * 0.7) * 3.0)
    r = reg.conformal_trend_interval(_daily(spark, ys), alpha=0.1).collect()[0]
    assert r.coverage_test >= 0.8


def test_qhat_grows_with_noise(spark):
    quiet = _mk_series(120, lambda t: math.sin(t) * 1.0)
    loud = _mk_series(120, lambda t: math.sin(t) * 25.0)
    rq = reg.conformal_trend_interval(_daily(spark, quiet)).collect()[0]
    rl = reg.conformal_trend_interval(_daily(spark, loud)).collect()[0]
    assert rl.q_hat > 5 * rq.q_hat


def test_sql_twin_matches_spark_exactly(spark):
    ys = _mk_series(60, lambda t: ((t * 13) % 9) - 4.0)
    r = reg.conformal_trend_interval(_daily(spark, ys)).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (day BIGINT, y DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)", list(enumerate(map(float, ys)))
    )
    row = con.execute(
        reg.conformal_trend_interval_sql("SELECT day, y FROM t0")
    ).fetchone()
    assert row == (
        r.n_fit, r.n_cal, r.n_test, r.slope, r.q_hat, r.coverage_test
    )
