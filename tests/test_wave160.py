"""Wave 160 — k-ary randomized response (local DP).

Hand-pinned mechanism + estimator on a tiny fixture (md5 draws
recomputed in python), the debiasing property at corpus size (the
estimator lands within a small band of the true shares while the raw
reported shares are visibly flattened toward uniform), report-count
conservation, and SQL-twin equality. Spec:
randomized_response_priority (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.privacy import (
    _RR_DENOM,
    randomized_response_frequency,
    randomized_response_frequency_sql,
)


def _u(key, salt):
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:15]
    return int(h, 16) / _RR_DENOM


def _hand(rows, p=0.75):
    cats = sorted({c for _, c in rows})
    k = len(cats)
    n = len(rows)
    n_true = {c: 0 for c in cats}
    n_rep = {c: 0 for c in cats}
    for key, c in rows:
        n_true[c] += 1
        if _u(key, ":rr1") < p:
            rep = c
        else:
            rep = cats[math.floor(_u(key, ":rr2") * k)]
        n_rep[rep] += 1
    out = {}
    for c in cats:
        st = n_true[c] / n
        sr = n_rep[c] / n
        deb = (sr - (1 - p) / k) / p
        out[c] = (n_true[c], n_rep[c], round(st, 6), round(sr, 6),
                  round(deb, 6), round(abs(deb - st), 6))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, c string")


def test_hand_recomputation(spark):
    rows = [(i, "abc"[(i * 7) % 3]) for i in range(1, 61)]
    got = {
        r.category: (
            r.n_true, r.n_reported, r.share_true, r.share_reported,
            r.share_debiased, r.abs_err,
        )
        for r in randomized_response_frequency(
            _df(spark, rows), "k", "c"
        ).collect()
    }
    assert got == _hand(rows)


def test_debiasing_beats_raw_reports(spark):
    """Skewed truth (80/15/5): raw reported shares are flattened
    toward uniform by the noise; the debiased estimator recovers the
    truth much more closely for the dominant class."""
    rows = []
    for i in range(1, 2001):
        c = "a" if i % 20 < 16 else ("b" if i % 20 < 19 else "c")
        rows.append((i, c))
    out = {
        r.category: r
        for r in randomized_response_frequency(
            _df(spark, rows), "k", "c"
        ).collect()
    }
    a = out["a"]
    assert a.share_true == pytest.approx(0.8, abs=0.01)
    # raw channel pulled visibly toward uniform
    assert a.share_reported < a.share_true - 0.05
    # estimator pulls it back
    assert abs(a.share_debiased - a.share_true) < 0.03
    assert a.abs_err < abs(a.share_reported - a.share_true)


def test_report_conservation(spark):
    rows = [(i, "xy"[i % 2]) for i in range(1, 101)]
    out = randomized_response_frequency(_df(spark, rows), "k", "c").collect()
    assert sum(r.n_reported for r in out) == sum(r.n_true for r in out) == 100


def test_sql_twin_matches_spark_exactly(spark):
    rows = [(i, "pqrst"[(i * 11) % 5]) for i in range(1, 301)]
    r = randomized_response_frequency(_df(spark, rows), "k", "c").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (k BIGINT, c VARCHAR)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    got = con.execute(
        randomized_response_frequency_sql("t0", "k", "c")
    ).fetchall()
    assert got == [
        (x.category, x.n_true, x.n_reported, x.share_true,
         x.share_reported, x.share_debiased, x.abs_err)
        for x in r
    ]
