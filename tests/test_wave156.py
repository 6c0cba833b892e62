"""Wave 156 — GPH log-periodogram long-memory estimator.

Hand-pinned recomputation (pure-python DFT + log regression with the
same day-index frequencies), behavioral pair (near-white noise gives
d ~ 0; a strongly trending/integrated series gives d near 1, the
frequency-domain signature of long memory), and SQL-twin equality.
Spec: gph_long_memory_daily (plans/timeseries_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    gph_long_memory,
    gph_long_memory_sql,
)

_D0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, counts):
    rows = []
    for day, c in enumerate(counts):
        for k in range(c):
            rows.append((_D0 + dt.timedelta(days=day, seconds=k),))
    return spark.createDataFrame(rows, "ts timestamp")


def _hand(counts):
    xs = [float(c) for c in counts]
    t = len(xs)
    mu = sum(xs) / t
    xc = [x - mu for x in xs]
    m = math.floor(math.sqrt(t))
    pts = []
    for j in range(1, m + 1):
        w = 2 * math.pi * j / t
        cc = sum(xc[i - 1] * math.cos(w * i) for i in range(1, t + 1))
        ss = sum(xc[i - 1] * math.sin(w * i) for i in range(1, t + 1))
        p = cc * cc + ss * ss
        if p > 0:
            pts.append(
                (math.log(4 * math.sin(math.pi * j / t) ** 2),
                 math.log(p))
            )
    mm = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] ** 2 for p in pts) - sx * sx / mm
    sxy = sum(p[0] * p[1] for p in pts) - sx * sy / mm
    d = -(sxy / sxx)
    se = math.sqrt((math.pi**2 / 6) / sxx)
    return t, mm, d, se


def test_hand_recomputation(spark):
    counts = [(i * 13) % 9 + ((i * 7) % 5) + 2 for i in range(60)]
    r = gph_long_memory(_events(spark, counts)).collect()[0]
    t, m, d, se = _hand(counts)
    assert (r.n_obs, r.m_freqs) == (t, m)
    assert r.d_hat == pytest.approx(round(d, 6), abs=1e-6)
    assert r.se_asymp == pytest.approx(round(se, 6), abs=1e-9)
    assert r.t_stat == pytest.approx(round(d / se, 6), abs=1e-5)


def test_white_vs_integrated(spark):
    """Pseudorandom counts (short memory): d near 0 within its SE.
    A monotone ramp (integrated-like spectrum, power piling into the
    lowest frequencies): d large and significant."""
    white = [((i * 29) % 13) + 5 for i in range(120)]
    ramp = [5 + i // 2 for i in range(120)]
    rw = gph_long_memory(_events(spark, white)).collect()[0]
    rr = gph_long_memory(_events(spark, ramp)).collect()[0]
    assert abs(rw.d_hat) < 3 * rw.se_asymp
    assert rr.d_hat > 0.6
    assert rr.t_stat > 3.0


def test_sql_twin_matches_spark_exactly(spark):
    counts = [((i * 17) % 11) + ((i * 3) % 4) + 1 for i in range(80)]
    r = gph_long_memory(_events(spark, counts)).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE events (ts TIMESTAMP)")
    rows = []
    for day, c in enumerate(counts):
        for k in range(c):
            rows.append((_D0 + dt.timedelta(days=day, seconds=k),))
    con.executemany("INSERT INTO events VALUES (?)", rows)
    row = con.execute(gph_long_memory_sql("events")).fetchone()
    assert row == (r.n_obs, r.m_freqs, r.d_hat, r.se_asymp, r.t_stat)
