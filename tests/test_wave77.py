"""Wave-77 hand pins: Ljung-Box, Cox-Stuart, turning points,
variance ratio, Jarque-Bera, Jonckheere-Terpstra — expected values
recomputed independently in-test.

Covered spec names: ljung_box_daily, cox_stuart_trend_daily,
turning_points_daily, variance_ratio_daily, jarque_bera_doclen,
jonckheere_price_trend.
"""

from __future__ import annotations

import math

import pytest

from mcas_question2_etl_spark.operators import evaluation, timeseries


def _daily(spark, values):
    return spark.createDataFrame(
        [(d, int(v)) for d, v in enumerate(values)], "day long, c long"
    )


def test_ljung_box_pin(spark):
    """Alternating series: strong negative lag-1 autocorrelation; Q
    recomputed in python for 3 lags."""
    xs = [10, 2, 9, 3, 8, 4, 7, 5, 6, 5]
    n = len(xs)
    mu = sum(xs) / n
    xc = [x - mu for x in xs]
    den = sum(v * v for v in xc)
    q = 0.0
    rs = []
    for l in range(1, 4):
        s = sum(xc[t] * xc[t - l] for t in range(l, n))
        rs.append(s / den)
        q += (s / den) ** 2 / (n - l)
    q *= n * (n + 2)
    r = timeseries.ljung_box(_daily(spark, xs), lags=3).collect()[0]
    assert (r.n_days, r.lags) == (n, 3)
    assert r.r1 == pytest.approx(round(rs[0], 6), abs=1e-9)
    assert r.q_stat == pytest.approx(round(q, 6), abs=1e-9)
    assert r.r1 < 0  # the alternation is visible at lag 1


def test_cox_stuart_pin(spark):
    """Rising 9-day series: middle day drops, pairs (x_i, x_{i+5}),
    all four pairs rise; a tied pair drops from the sign count."""
    xs = [1, 2, 3, 4, 5, 6, 7, 8, 9]  # h = ceil(9/2) = 5, pairs i=1..4
    r = timeseries.cox_stuart(_daily(spark, xs)).collect()[0]
    assert (r.n_days, r.n_pairs, r.n_plus, r.n_minus) == (9, 4, 4, 0)
    assert r.z == pytest.approx(round((4 - 2) / math.sqrt(1.0), 6))

    xs2 = [1, 2, 3, 4, 1, 9, 3]  # n=7, h=4: pairs (1,1)tie,(2,9)+,(3,3)tie
    r2 = timeseries.cox_stuart(_daily(spark, xs2)).collect()[0]
    assert (r2.n_pairs, r2.n_plus, r2.n_minus) == (1, 1, 0)


def test_turning_points_pin(spark):
    """[1,3,2,2,4,1]: turns at t=2 (peak 3) and t=5 (peak 4); the
    flat step 2,2 is NOT a turn (strict convention)."""
    xs = [1, 3, 2, 2, 4, 1]
    r = timeseries.turning_points(_daily(spark, xs)).collect()[0]
    assert (r.n_days, r.n_turning) == (6, 2)
    e = 2 * (6 - 2) / 3
    v = (16 * 6 - 29) / 90
    assert r.expected == pytest.approx(round(e, 6))
    assert r.z == pytest.approx(round((2 - e) / math.sqrt(v), 6), abs=1e-9)


def test_variance_ratio_pin(spark):
    """VR(2) recomputed in python with the documented population-
    variance convention; a pure linear trend gives VR ~ 1 with zero
    variance guarded (NULL), so use a noisy series."""
    xs = [3.0, 5.0, 4.0, 8.0, 7.0, 11.0, 9.0, 14.0, 12.0, 17.0]
    n = len(xs)
    mu = (xs[-1] - xs[0]) / (n - 1)
    r1 = [xs[t] - xs[t - 1] - mu for t in range(1, n)]
    v1 = sum(v * v for v in r1) / len(r1)
    q = 2
    rq = [xs[t] - xs[t - q] - q * mu for t in range(q, n)]
    vq = sum(v * v for v in rq) / (len(rq) * q)
    r = timeseries.variance_ratio(_daily(spark, [int(x) for x in xs]), q=2).collect()[0]
    assert (r.n_days, r.q) == (n, 2)
    assert r.var_1 == pytest.approx(round(v1, 6), abs=1e-9)
    assert r.var_q == pytest.approx(round(vq, 6), abs=1e-9)
    assert r.vr == pytest.approx(round(vq / v1, 6), abs=1e-9)
    assert r.vr < 1.0  # sawtooth mean-reverts


def test_jarque_bera_pin(spark):
    """Skewed integer sample: moments, skewness, kurtosis and JB
    recomputed in python from the same raw power sums."""
    # note: avoid moment values landing exactly on a x.xxxxxx5
    # rounding boundary (python round() is banker's, Spark half-up)
    xs = [1, 1, 1, 2, 2, 3, 4, 11]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum(x * x for x in xs) / n - mu * mu
    m3 = (
        sum(x**3 for x in xs) / n
        - 3 * mu * (sum(x * x for x in xs) / n)
        + 2 * mu**3
    )
    m4 = (
        sum(x**4 for x in xs) / n
        - 4 * mu * (sum(x**3 for x in xs) / n)
        + 6 * mu * mu * (sum(x * x for x in xs) / n)
        - 3 * mu**4
    )
    s = m3 / (m2 * math.sqrt(m2))
    k = m4 / (m2 * m2)
    jb = n / 6 * (s * s + (k - 3) ** 2 / 4)
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    r = evaluation.jarque_bera(df, "v").collect()[0]
    assert r.n == n
    assert r.mean == pytest.approx(round(mu, 6))
    assert r.skewness == pytest.approx(round(s, 6), abs=1e-9)
    assert r.kurtosis == pytest.approx(round(k, 6), abs=1e-9)
    assert r.jb_stat == pytest.approx(round(jb, 6), abs=1e-9)
    assert r.skewness > 1.0  # the outlier makes it right-skewed


def test_jonckheere_terpstra_pin(spark):
    """Three ordered groups with a planted rise: JT recomputed by
    brute force over all cross-group pairs (ties counted half);
    no-tie null moments for z."""
    groups = {1: [1.0, 2.0], 2: [2.0, 4.0], 3: [5.0, 6.0, 3.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    jt2 = 0
    ks = sorted(groups)
    for i, gi in enumerate(ks):
        for gj in ks[i + 1 :]:
            for vi in groups[gi]:
                for vj in groups[gj]:
                    if vj > vi:
                        jt2 += 2
                    elif vj == vi:
                        jt2 += 1
    n = sum(len(v) for v in groups.values())
    sn2 = sum(len(v) ** 2 for v in groups.values())
    sn23 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in groups.values())
    e = (n * n - sn2) / 4
    var = (n * n * (2 * n + 3) - sn23) / 72
    z = (jt2 / 2 - e) / math.sqrt(var)
    df = spark.createDataFrame(rows, "g long, v double")
    r = evaluation.jonckheere_terpstra(df, "g", "v").collect()[0]
    assert (r.n, r.k, r.jt2) == (n, 3, jt2)
    assert r.jt == pytest.approx(jt2 / 2)
    assert r.z == pytest.approx(round(z, 6), abs=1e-9)
    assert r.z > 0  # planted rising trend
