"""Wave-78 hand pins: ADF unit root, Engle-Granger cointegration,
Chow break, Breusch-Pagan, ARCH-LM, PACF — expected values
recomputed independently in-test with pure-python OLS.

Covered spec names: adf_unit_root_daily, engle_granger_coint,
chow_break_daily, breusch_pagan_daily, arch_lm_daily, pacf_daily.
"""

from __future__ import annotations

import math

import pytest

from mcas_question2_etl_spark.operators import regression, timeseries


def _daily(spark, values, col="y"):
    return spark.createDataFrame(
        [(d, float(v)) for d, v in enumerate(values)], f"day long, {col} double"
    )


def _ols(xs, ys):
    """Simple OLS: returns (slope, intercept, ssr, sxx)."""
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    b = sxy / sxx
    a = my - b * mx
    ssr = sum((y - a - b * x) ** 2 for x, y in zip(xs, ys))
    return b, a, ssr, sxx


def test_adf_unit_root_pin(spark):
    """Strongly mean-reverting series: DF stat should be deeply
    negative; recomputed via Δx on x_{t-1} OLS."""
    xs = [10.0, 2.0, 9.0, 3.0, 8.0, 4.0, 7.0, 5.0, 6.0, 5.0]
    z = xs[:-1]
    y = [xs[t] - xs[t - 1] for t in range(1, len(xs))]
    b, a, ssr, szz = _ols(z, y)
    m = len(y)
    se = math.sqrt((ssr / (m - 2)) / szz)
    r = regression.adf_unit_root(_daily(spark, xs, "y")).collect()[0]
    assert r.n_obs == m
    assert r.slope == pytest.approx(round(b, 6), abs=1e-9)
    assert r.df_stat == pytest.approx(round(b / se, 6), abs=1e-9)
    assert r.df_stat < -2  # alternation mean-reverts hard


def test_engle_granger_pin(spark):
    """y tracks 2x plus small noise: the spread is stationary, so
    the EG stat is negative; recomputed step by step."""
    xv = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    yv = [2.1, 3.9, 6.2, 7.8, 10.1, 12.2, 13.8, 16.1]
    n = len(xv)
    beta, alpha, _, _ = _ols(xv, yv)
    e = [y - alpha - beta * x for x, y in zip(xv, yv)]
    el = e[:-1]
    de = [e[t] - e[t - 1] for t in range(1, n)]
    sel2 = sum(v * v for v in el)
    selde = sum(a_ * b_ for a_, b_ in zip(el, de))
    sde2 = sum(v * v for v in de)
    rho = selde / sel2
    m = len(de)
    se = math.sqrt(((sde2 - rho * selde) / (m - 1)) / sel2)
    df = spark.createDataFrame(
        [(d, a_, b_) for d, (a_, b_) in enumerate(zip(xv, yv))],
        "day long, x double, y double",
    )
    r = regression.engle_granger(df).collect()[0]
    assert r.n_days == n
    assert r.beta == pytest.approx(round(beta, 6), abs=1e-9)
    assert r.eg_stat == pytest.approx(round(rho / se, 6), abs=1e-9)


def test_chow_break_pin(spark):
    """Slope doubles in the second half: pooled SSR far exceeds the
    split SSRs, so F is large; recomputed from three OLS fits."""
    ys = [1.1, 1.9, 3.2, 3.8, 5.1, 8.2, 10.8, 14.3, 16.9, 20.1]
    n = len(ys)
    ts = list(range(1, n + 1))
    h = n // 2
    _, _, ssr_p, _ = _ols([float(t) for t in ts], ys)
    _, _, ssr_1, _ = _ols([float(t) for t in ts[:h]], ys[:h])
    _, _, ssr_2, _ = _ols([float(t) for t in ts[h:]], ys[h:])
    f = ((ssr_p - ssr_1 - ssr_2) / 2) / ((ssr_1 + ssr_2) / (n - 4))
    r = regression.chow_break(_daily(spark, ys)).collect()[0]
    assert (r.n_days, r.break_t) == (n, h)
    assert r.ssr_ratio == pytest.approx(
        round((ssr_1 + ssr_2) / ssr_p, 6), abs=1e-9
    )
    assert r.f_stat == pytest.approx(round(f, 6), rel=1e-6)
    assert r.f_stat > 10  # the break is blatant


def test_breusch_pagan_pin(spark):
    """Fan-shaped residuals (noise grows with t): LM recomputed from
    the aux regression of e^2 on t."""
    ys = [1.1, 1.9, 3.2, 3.7, 5.5, 5.4, 7.9, 7.0, 10.2, 8.9]
    n = len(ys)
    ts = [float(t) for t in range(1, n + 1)]
    b, a, _, _ = _ols(ts, ys)
    g = [(y - a - b * t) ** 2 for t, y in zip(ts, ys)]
    mg, mt = sum(g) / n, sum(ts) / n
    sxx = sum((t - mt) ** 2 for t in ts)
    sgg = sum((v - mg) ** 2 for v in g)
    sxg = sum((t - mt) * (v - mg) for t, v in zip(ts, g))
    r2 = sxg * sxg / (sxx * sgg)
    r = regression.breusch_pagan(_daily(spark, ys)).collect()[0]
    assert r.n_days == n
    assert r.r2_aux == pytest.approx(round(r2, 6), abs=1e-9)
    assert r.lm_stat == pytest.approx(round(n * r2, 6), abs=1e-9)


def test_arch_lm_pin(spark):
    """Volatility clustering (big shocks bunched at the end): LM
    recomputed from the u_t on u_{t-1} regression."""
    ys = [5.0, 5.2, 4.9, 5.1, 5.0, 9.0, 1.0, 9.5, 0.5, 9.8]
    n = len(ys)
    my = sum(ys) / n
    u = [(y - my) ** 2 for y in ys]
    x, yv = u[:-1], u[1:]
    m = len(x)
    mx, myv = sum(x) / m, sum(yv) / m
    sxx = sum((v - mx) ** 2 for v in x)
    syy = sum((v - myv) ** 2 for v in yv)
    sxy = sum((a_ - mx) * (b_ - myv) for a_, b_ in zip(x, yv))
    r2 = sxy * sxy / (sxx * syy)
    r = regression.arch_lm(_daily(spark, ys)).collect()[0]
    assert r.n_obs == m
    assert r.r2 == pytest.approx(round(r2, 6), abs=1e-9)
    assert r.lm_stat == pytest.approx(round(m * r2, 6), abs=1e-9)


def test_pacf_pin(spark):
    """AR(1)-ish rising-falling series: PACF recomputed via
    Durbin-Levinson from the biased ACF."""
    xs = [3, 5, 8, 11, 12, 10, 7, 5, 4, 6, 9, 12]
    n = len(xs)
    mu = sum(xs) / n
    xc = [v - mu for v in xs]
    den = sum(v * v for v in xc)
    r = [
        sum(xc[t] * xc[t - l] for t in range(l, n)) / den for l in (1, 2, 3)
    ]
    p2 = (r[1] - r[0] * r[0]) / (1 - r[0] * r[0])
    p21 = r[0] - p2 * r[0]
    p3 = (r[2] - p21 * r[1] - p2 * r[0]) / (1 - p21 * r[0] - p2 * r[1])
    df = spark.createDataFrame(
        [(d, int(v)) for d, v in enumerate(xs)], "day long, c long"
    )
    row = timeseries.pacf3(df).collect()[0]
    assert row.n_days == n
    assert row.r1 == pytest.approx(round(r[0], 6), abs=1e-9)
    assert row.r2 == pytest.approx(round(r[1], 6), abs=1e-9)
    assert row.r3 == pytest.approx(round(r[2], 6), abs=1e-9)
    assert row.pacf2 == pytest.approx(round(p2, 6), abs=1e-9)
    assert row.pacf3 == pytest.approx(round(p3, 6), abs=1e-9)
