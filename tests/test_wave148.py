"""Wave 148 — KPSS level-stationarity test.

Hand-pinned LM recomputation (textbook formula in floats vs the
scaled-integer implementation), behavioral pair (a mean-reverting
alternation keeps LM small; a trending/random-walk-like series blows
it up — the null reversal vs ADF), Schwert bandwidth pin, and SQL-twin
equality. Spec: kpss_level_daily (plans/timeseries_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.regression import (
    kpss_level_test,
    kpss_level_test_sql,
)


def _df(spark, ys):
    return spark.createDataFrame(
        [(d, int(y)) for d, y in enumerate(ys)], "day long, y long"
    )


def _hand(ys):
    t = len(ys)
    ybar = sum(ys) / t
    e = [y - ybar for y in ys]
    s = []
    acc = 0.0
    for v in e:
        acc += v
        s.append(acc)
    num = sum(v * v for v in s)
    q = min(16, math.floor(4 * (t / 100) ** 0.25))
    g = [
        sum(e[i] * e[i - j] for i in range(j, t)) / t
        for j in range(q + 1)
    ]
    lr = g[0] + 2 * sum((1 - j / (q + 1)) * g[j] for j in range(1, q + 1))
    return q, num / (t * t * lr)


def test_hand_recomputation(spark):
    ys = [12, 15, 9, 14, 11, 16, 10, 13, 12, 15, 8, 14, 11, 17, 10, 12]
    r = kpss_level_test(_df(spark, ys)).collect()[0]
    q, lm = _hand(ys)
    assert r.n_obs == len(ys)
    assert r.q_lag == q
    assert r.lm_stat == pytest.approx(round(lm, 6), abs=1e-6)


def test_schwert_bandwidth_pins(spark):
    # T=16 -> floor(4*(0.16)^0.25) = floor(2.529) = 2
    r = kpss_level_test(_df(spark, range(16))).collect()[0]
    assert r.q_lag == 2
    # T=120 -> floor(4*(1.2)^0.25) = floor(4.187) = 4
    r = kpss_level_test(_df(spark, [i % 7 for i in range(120)])).collect()[0]
    assert r.q_lag == 4


def test_stationary_vs_trending(spark):
    """Mean-reverting alternation: LM small (stationarity null holds).
    A deterministic trend (the archetypal level-nonstationary series):
    LM large — exactly where ADF and KPSS give opposite calls."""
    stationary = [10 + (1 if i % 2 else -1) for i in range(200)]
    trending = list(range(200))
    r_s = kpss_level_test(_df(spark, stationary)).collect()[0]
    r_t = kpss_level_test(_df(spark, trending)).collect()[0]
    assert r_s.lm_stat < 0.2
    assert r_t.lm_stat > 1.0
    assert r_t.lm_stat > 10 * r_s.lm_stat


def test_sql_twin_matches_spark_exactly(spark):
    ys = [((i * 37) % 101) + ((i * 13) % 7) for i in range(150)]
    r = kpss_level_test(_df(spark, ys)).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (day BIGINT, y BIGINT)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)", list(enumerate(int(y) for y in ys))
    )
    row = con.execute(
        kpss_level_test_sql("SELECT day, y FROM t0", date_col="day")
    ).fetchone()
    assert row == (r.n_obs, r.q_lag, r.lm_stat)
