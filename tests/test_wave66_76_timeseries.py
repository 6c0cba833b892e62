"""Hand-computed pins for the round-4 wave 66-76 timeseries /
regression specs (VERDICT r4 #2: the oracle differential is shared
derivation — these pins are computed independently in-test, numpy/pure
python, so a mistake encoded in BOTH the Spark plan and its SQL twin
still fails here).

Covered spec names: page_hinkley_drift, segmented_regression_daily,
haar_energy_daily, runs_test_daily, ransac_line_daily,
spectral_entropy_daily, seasonal_mann_kendall, newey_west_trend_se,
ks_exponential_interarrival, durbin_watson_daily,
deming_regression_qty_price.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from mcas_question2_etl_spark.operators import regression, timeseries


def _daily(spark, values, series="click"):
    rows = [(series, d, int(v)) for d, v in enumerate(values)]
    return spark.createDataFrame(rows, "event_type string, day long, c long")


def _daily_y(spark, values):
    rows = [(d, float(v)) for d, v in enumerate(values)]
    return spark.createDataFrame(rows, "day long, y double")


# ── page_hinkley_drift ─────────────────────────────────────────────────


def test_page_hinkley_pin(spark):
    """Flat series then a level shift: PH recomputed in pure python
    must match row for row, and the alarm fires only after the shift
    accumulates past lambda."""
    xs = [10] * 6 + [30] * 6
    out = {
        r.day: r
        for r in timeseries.page_hinkley(
            _daily(spark, xs), delta=2.0, lam=20.0
        ).collect()
    }
    # independent recomputation
    m, mn, s, cnt = 0.0, 0.0, 0.0, 0
    for d, x in enumerate(xs):
        cnt += 1
        s += x
        m += x - s / cnt - 2.0
        mn = min(mn, m)
        ph = m - mn
        assert out[d].ph == pytest.approx(round(ph, 6), abs=1e-9), d
        assert out[d].alarm == (ph > 20.0), d
    assert out[0].alarm is False and out[11].alarm is True


# ── segmented_regression_daily ─────────────────────────────────────────


def test_segmented_regression_finds_exact_kink(spark):
    """Noiseless piecewise series (slope 1 then slope -2, kink after
    index 10): the SSE-optimal break is exactly the kink, both segment
    slopes recover exactly, SSE ~ 0."""
    ys = [float(t) for t in range(1, 11)]  # t=1..10: y = t
    ys += [10.0 - 2.0 * k for k in range(1, 11)]  # next 10: slope -2
    r = timeseries.segmented_regression(
        _daily_y(spark, ys), min_seg=5
    ).collect()[0]
    assert r.n_days == 20
    # the kink point itself lies on BOTH lines, so SSE = 0 at k = 9
    # (kink point in the right segment) and k = 10; ties break earliest
    assert r.break_index == 9
    assert r.slope_left == pytest.approx(1.0, abs=1e-9)
    assert r.slope_right == pytest.approx(-2.0, abs=1e-9)
    assert r.sse_ratio == pytest.approx(0.0, abs=1e-6)


# ── haar_energy_daily ──────────────────────────────────────────────────


def test_haar_energy_pin(spark):
    """8-day series [1,3,2,2,5,1,4,4]: level-1 details (first minus
    second of each pair) are (-2,0,4,0) -> energy 20; approximations
    (4,4,6,8) give level-2 details (0,-2) -> 4; level 3 (8,14) -> 36.
    Normalization divides by 2^level."""
    out = {
        (r.level): r
        for r in timeseries.haar_energy(
            _daily(spark, [1, 3, 2, 2, 5, 1, 4, 4]), levels=3
        ).collect()
    }
    assert (out[1].n_pairs, out[1].energy_raw, out[1].energy_norm) == (4, 20, 10.0)
    assert (out[2].n_pairs, out[2].energy_raw, out[2].energy_norm) == (2, 4, 1.0)
    assert (out[3].n_pairs, out[3].energy_raw, out[3].energy_norm) == (1, 36, 4.5)


def test_haar_energy_odd_tail_drops(spark):
    out = {
        r.level: r
        for r in timeseries.haar_energy(
            _daily(spark, [5, 1, 7]), levels=2
        ).collect()
    }
    # day 3 has no partner at level 1; level 2 has a single approx -> no pair
    assert out[1].n_pairs == 1 and out[1].energy_raw == 16
    assert 2 not in out


# ── runs_test_daily ────────────────────────────────────────────────────


def test_runs_test_alternating_and_trending(spark):
    """[1,5,2,6,3,7]: median 4 (doubled 8); signs alternate -> 6 runs
    of 3+3; z = (6 - E[R]) / sd with E[R] = 2*3*3/6+1 = 4,
    Var = 2*3*3*(18-6)/(36*5) = 1.2."""
    ev = spark.createDataFrame(
        [(d, int(v)) for d, v in enumerate([1, 5, 2, 6, 3, 7])],
        "day long, c long",
    )
    r = timeseries.runs_test(ev).collect()[0]
    assert (r.n_days, r.n_above, r.n_below, r.runs) == (6, 3, 3, 6)
    assert r.z == pytest.approx(round((6 - 4.0) / math.sqrt(1.2), 6))
    # monotone series -> 2 runs, negative z
    ev2 = spark.createDataFrame(
        [(d, v) for d, v in enumerate([1, 2, 3, 10, 11, 12])],
        "day long, c long",
    )
    r2 = timeseries.runs_test(ev2).collect()[0]
    assert r2.runs == 2 and r2.z < 0


def test_runs_test_degenerate_emits_null_z(spark):
    """ADVICE r4: constant series (every day equals the median) must
    yield NULL z, not NaN."""
    ev = spark.createDataFrame([(d, 5) for d in range(4)], "day long, c long")
    r = timeseries.runs_test(ev).collect()[0]
    assert r.z is None


# ── ransac_line_daily ──────────────────────────────────────────────────


def test_ransac_line_pin(spark):
    """Seeds at day % 7 == 3 (days 3 and 10 only): the single
    candidate line passes through those points; planting them on
    y = 2t + 1 with outliers elsewhere pins slope/intercept and the
    inlier count."""
    ys = {d: 2.0 * d + 1.0 for d in range(14)}
    ys[0] += 50.0
    ys[5] -= 40.0  # outliers far outside eps
    daily = spark.createDataFrame(
        [(d, ys[d]) for d in range(14)], "day long, y double"
    )
    r = regression.ransac_line(daily, seed_mod=7, seed_rem=3).collect()[0]
    assert (r.n_days, r.n_candidates, r.x1, r.x2) == (14, 1, 3, 10)
    assert r.slope == pytest.approx(2.0) and r.intercept == pytest.approx(1.0)
    # eps = 0.5 * stddev >> 0 but << 40, so exactly the 12 on-line days
    assert r.n_inliers == 12
    assert r.inlier_frac == pytest.approx(round(12 / 14, 6))


def test_ransac_line_degenerate_seed_set_raises(spark):
    daily = spark.createDataFrame(
        [(d, float(d)) for d in (0, 1, 2, 7, 8)], "day long, y double"
    )
    with pytest.raises(ValueError, match="degenerate seed set"):
        regression.ransac_line(daily, seed_mod=7, seed_rem=3).collect()


# ── seasonal_mann_kendall ──────────────────────────────────────────────


def test_seasonal_mann_kendall_pin(spark):
    """Two weeks, week 2 busier than week 1 on every weekday: each of
    the 7 seasons contributes S_s = +1 from its single pair, n_s = 2,
    Var numerator 2*1*9 = 18 -> Var = 7*18/18 = 7, z = 6/sqrt(7)."""
    base = dt.datetime(1970, 1, 1)
    rows, eid = [], 0
    for d in range(14):
        n_events = 1 + d // 7  # 1/day in week 1, 2/day in week 2
        for k in range(n_events):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=d, minutes=k), 1, "click", 1.0, "{}")
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    r = timeseries.seasonal_mann_kendall(ev).collect()[0]
    assert (r.n_days, r.s_stat) == (14, 7)
    assert r.var_s == pytest.approx(7.0)
    assert r.z == pytest.approx(round(6.0 / math.sqrt(7.0), 6))


# ── newey_west_trend_se / durbin_watson_daily ──────────────────────────

_SERIES = [3.0, 5.0, 4.0, 8.0, 7.0, 11.0, 9.0, 14.0, 12.0, 17.0, 15.0, 20.0]


def _ols_residuals(ys):
    n = len(ys)
    ts = list(range(1, n + 1))
    mt = sum(ts) / n
    my = sum(ys) / n
    stt = sum((t - mt) ** 2 for t in ts)
    sty = sum((t - mt) * (y - my) for t, y in zip(ts, ys))
    b = sty / stt
    u = [y - my - b * (t - mt) for t, y in zip(ts, ys)]
    xc = [t - mt for t in ts]
    return b, u, xc, stt


def test_newey_west_trend_se_pin(spark):
    """Sawtooth-around-trend series: slope, OLS SE and the Bartlett-
    weighted HAC SE all recomputed independently in pure python
    (the lag weights 1 - l/(L+1) are the convention under test)."""
    lags = 3
    b, u, xc, stt = _ols_residuals(_SERIES)
    n = len(_SERIES)
    v = sum(ui * ui * xi * xi for ui, xi in zip(u, xc))
    for l in range(1, lags + 1):
        w = 1.0 - l / (lags + 1.0)
        v += 2.0 * w * sum(
            u[t] * u[t - l] * xc[t] * xc[t - l] for t in range(l, n)
        )
    se_hac = math.sqrt(v / (stt * stt))
    ssr = sum(ui * ui for ui in u)
    se_ols = math.sqrt((ssr / (n - 2)) / stt)

    r = regression.newey_west_trend(
        _daily_y(spark, _SERIES), lags=lags
    ).collect()[0]
    assert r.n_days == n
    assert r.slope == pytest.approx(round(b, 6), abs=1e-9)
    assert r.se_ols == pytest.approx(round(se_ols, 6), abs=1e-9)
    assert r.se_hac == pytest.approx(round(se_hac, 6), abs=1e-9)
    assert r.ratio == pytest.approx(round(se_hac / se_ols, 6), abs=1e-9)


def test_durbin_watson_daily_pin(spark):
    """Same series: DW = Σ(u_t - u_{t-1})²/Σu² and rho1 recomputed in
    pure python; the alternating sawtooth makes DW > 2 (negative
    lag-1 autocorrelation)."""
    b, u, _, _ = _ols_residuals(_SERIES)
    dw = sum((u[t] - u[t - 1]) ** 2 for t in range(1, len(u))) / sum(
        ui * ui for ui in u
    )
    rho1 = sum(u[t] * u[t - 1] for t in range(1, len(u))) / sum(
        ui * ui for ui in u
    )
    r = regression.durbin_watson_trend(_daily_y(spark, _SERIES)).collect()[0]
    assert r.slope == pytest.approx(round(b, 6), abs=1e-9)
    assert r.dw == pytest.approx(round(dw, 6), abs=1e-9)
    assert r.rho1 == pytest.approx(round(rho1, 6), abs=1e-9)
    assert r.dw > 2.0 and r.rho1 < 0.0


# ── deming_regression_qty_price ────────────────────────────────────────


def test_deming_regression_pin(spark):
    """Five (x, y) points with 2dp values: Deming slope from the
    closed form recomputed in python; identity checks — |slope| >=
    |slope_ols| (OLS attenuates) and attenuation = ols/deming."""
    pts = [(1.0, 1.2), (2.0, 2.3), (3.0, 2.8), (4.0, 4.4), (5.0, 4.9)]
    n = len(pts)
    mx = sum(p[0] for p in pts) / n
    my = sum(p[1] for p in pts) / n
    sxx = sum((p[0] - mx) ** 2 for p in pts)
    syy = sum((p[1] - my) ** 2 for p in pts)
    sxy = sum((p[0] - mx) * (p[1] - my) for p in pts)
    slope = (syy - sxx + math.sqrt((syy - sxx) ** 2 + 4 * sxy * sxy)) / (
        2 * sxy
    )
    df = spark.createDataFrame(pts, "x double, y double")
    r = regression.deming_regression(df, "x", "y").collect()[0]
    assert r.n == n
    assert r.slope == pytest.approx(round(slope, 6), abs=1e-9)
    assert r.intercept == pytest.approx(round(my - slope * mx, 6), abs=1e-9)
    assert r.slope_ols == pytest.approx(round(sxy / sxx, 6), abs=1e-9)
    assert abs(r.slope) >= abs(r.slope_ols)
    assert r.attenuation == pytest.approx(round((sxy / sxx) / slope, 6), abs=1e-9)


# ── ks_exponential_interarrival ────────────────────────────────────────


def test_ks_exponential_gaps_pin(spark):
    """One user with gaps 1s, 2s, 4s: ECDF vs fitted Exp(mean 7/3 s)
    recomputed in python (both sides of each step)."""
    base = dt.datetime(1970, 1, 1)
    offsets = [0, 1, 3, 7]  # seconds -> gaps 1, 2, 4
    ev = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), 1, "click", 1.0, "{}")
            for i, s in enumerate(offsets)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    gaps = [1e6, 2e6, 4e6]  # microseconds
    mean = sum(gaps) / 3
    d_expect = 0.0
    for i, g in enumerate(sorted(gaps)):
        fx = 1.0 - math.exp(-g / mean)
        d_expect = max(d_expect, abs((i + 1) / 3 - fx), abs(i / 3 - fx))
    r = timeseries.ks_exponential_gaps(ev).collect()[0]
    assert r.n_gaps == 3
    assert r.mean_gap_s == pytest.approx(round(7 / 3, 6))
    assert r.d_stat == pytest.approx(round(d_expect, 6), abs=1e-9)
    assert r.d_sqrt_n == pytest.approx(round(d_expect * math.sqrt(3), 6), abs=1e-6)


# ── spectral_entropy_daily ─────────────────────────────────────────────


def test_spectral_entropy_daily_pin(spark, tmp_path):
    """Spec-level pin: 28-day count series with a planted period-7
    cycle; expected entropy recomputed in python from the same
    Schuster periodogram definition (power fractions rounded to 6dp
    before the entropy, matching both engines)."""
    base = dt.datetime(1970, 1, 1)
    counts = [3 + (2 if d % 7 == 0 else 0) + (d % 3 == 0) for d in range(28)]
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for k in range(c):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=d, minutes=k), 1, "click", 1.0, "{}")
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    ev.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")

    n = len(counts)
    mu = sum(counts) / n
    ss = sum((x - mu) ** 2 for x in counts)
    fracs = []
    for p in range(2, 31):
        cr = sum((x - mu) * math.cos(2 * math.pi * t / p) for t, x in enumerate(counts))
        si = sum((x - mu) * math.sin(2 * math.pi * t / p) for t, x in enumerate(counts))
        fracs.append(round((cr * cr + si * si) / (n / 2 * ss), 6))
    pos = [f for f in fracs if f > 0.0]
    tp = sum(pos)
    ent = -sum((f / tp) * math.log(f / tp) for f in pos)

    from mcas_question2_etl_spark.plans.timeseries_specs import (
        spectral_entropy_daily,
    )

    r = spectral_entropy_daily(spark, str(tmp_path)).collect()[0]
    assert r.n_periods == len(pos)
    assert r.total_power_frac == pytest.approx(round(tp, 6), abs=1e-9)
    assert r.spectral_entropy == pytest.approx(round(ent, 6), abs=1e-6)
    assert r.entropy_norm == pytest.approx(
        round(ent / math.log(len(pos)), 6), abs=1e-6
    )
