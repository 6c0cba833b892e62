"""Wave 159 — Phillips-Perron unit-root test.

Hand-pinned Z_tau recomputation (Hamilton 17.6.12 case 2 in pure
python), the lag-0 equivalence property (on a serially-uncorrelated
residual series the correction vanishes: lambda^2 ~ gamma_0 and
Z_tau ~ the plain DF t), random-walk vs mean-reverting behavior, and
SQL-twin equality. Spec: phillips_perron_daily
(plans/timeseries_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.regression import (
    adf_unit_root,
    phillips_perron,
    phillips_perron_sql,
)


def _df(spark, ys):
    return spark.createDataFrame(
        [(d, float(y)) for d, y in enumerate(ys)], "day long, y double"
    )


def _hand(ys, mx=16):
    pts = [(i, float(y)) for i, y in enumerate(ys)]
    lag = [(y2 - y1, y1) for (_, y1), (_, y2) in zip(pts, pts[1:])]
    m = len(lag)
    sz = sum(z for _, z in lag)
    sy = sum(y for y, _ in lag)
    szz = sum(z * z for _, z in lag) - sz * sz / m
    szy = sum(y * z for y, z in lag) - sz * sy / m
    syy = sum(y * y for y, _ in lag) - sy * sy / m
    b = szy / szz
    a = sy / m - b * sz / m
    u = [y - a - b * z for y, z in lag]
    sse = syy - b * szy
    s2 = sse / (m - 2)
    se = math.sqrt(s2 / szz)
    t = b / se
    q = min(mx, math.floor(4 * (m / 100) ** 0.25))
    g = [sum(u[i] * u[i - j] for i in range(j, m)) / m for j in range(q + 1)]
    lam2 = g[0] + 2 * sum(
        (1 - j / (q + 1)) * g[j] for j in range(1, q + 1)
    )
    z = math.sqrt(g[0] / lam2) * t - (lam2 - g[0]) * m * se / (
        2 * math.sqrt(lam2) * math.sqrt(s2)
    )
    return m, q, b, z


def test_hand_recomputation(spark):
    ys = [((i * 13) % 9) + ((i * 7) % 5) + 10 for i in range(60)]
    r = phillips_perron(_df(spark, ys)).collect()[0]
    m, q, b, z = _hand(ys)
    assert (r.n_obs, r.q_lag) == (m, q)
    assert r.rho == pytest.approx(round(b, 6), abs=1e-9)
    assert r.pp_ztau == pytest.approx(round(z, 6), abs=1e-6)


def test_mean_reverting_vs_random_walk(spark):
    """Noisy alternation (strongly mean-reverting — a perfect
    alternation fits the DF regression EXACTLY and degenerates to
    0/0, hence the jitter): Z_tau deeply negative (reject unit
    root). A deterministic near-random-walk ramp: Z_tau near 0."""
    revert = [
        10 + (1 if i % 2 else -1) + (((i * 7) % 3) - 1) * 0.2
        for i in range(150)
    ]
    walk = [i + ((i * 7) % 3) * 0.1 for i in range(150)]
    rr = phillips_perron(_df(spark, revert)).collect()[0]
    rw = phillips_perron(_df(spark, walk)).collect()[0]
    assert rr.pp_ztau < -10.0
    assert rw.pp_ztau > -2.0


def test_correction_tracks_residual_autocovariance(spark):
    """The whole point of PP vs plain DF: negatively autocorrelated
    residuals give lambda^2 < gamma_0, pushing Z_tau BELOW the plain
    t (and vice versa). On this fixture the hand recursion confirms
    the direction against adf_unit_root's uncorrected statistic —
    both still rejecting, PP more deeply."""
    noise = [10 + (((i * 2654435761) >> 7) % 17) - 8 for i in range(150)]
    pp = phillips_perron(_df(spark, noise)).collect()[0]
    adf = adf_unit_root(_df(spark, noise), value_col="y").collect()[0]
    m, q, b, z = _hand(noise)
    assert pp.pp_ztau == pytest.approx(round(z, 6), abs=1e-6)
    assert pp.pp_ztau < adf.df_stat < -5.0


def test_sql_twin_matches_spark_exactly(spark):
    ys = [((i * 37) % 101) + ((i * 13) % 7) for i in range(140)]
    r = phillips_perron(_df(spark, ys)).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (day BIGINT, y DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)",
        [(d, float(y)) for d, y in enumerate(ys)],
    )
    row = con.execute(
        phillips_perron_sql("SELECT day, y FROM t0", date_col="day")
    ).fetchone()
    assert row == (r.n_obs, r.q_lag, r.rho, r.pp_ztau)
