"""Wave 170 — doubly-robust off-policy evaluation.

Hand-pinned estimator recomputation; the double-robustness property
planted two ways (biased model + correct propensities: DM biased, DR
lands on the IPS-consistent truth; perfect model + broken
propensities: IPS off, DR lands on the model's truth); and SQL-twin
equality. Spec: offpolicy_doubly_robust (plans/ops_bi_specs.py),
gated in tests/test_contract.py.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from mcas_question2_etl_spark.operators.causal import (
    dr_offpolicy_eval,
    dr_offpolicy_eval_sql,
)


def _u(key):
    return int(
        hashlib.md5(f"{key}:act".encode()).hexdigest()[:15], 16
    ) / float(1 << 60)


def _log(n, prop_override=None):
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
        if prop_override is not None:
            p = prop_override
        r = 1 if a == b % 3 else 0
        t = b % 3
        rows.append((b, a, p, r, t, 0.5 + 0.1 * t, 0.5 + 0.1 * a))
    return rows


_SCHEMA = (
    "b long, action long, prop double, reward long, tgt long,"
    " mu_t double, mu_l double"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _hand(rows):
    n = len(rows)
    smt = sum(r[5] for r in rows)
    swr = sum((1 / r[2]) * r[3] for r in rows if r[4] == r[1])
    swm = sum((1 / r[2]) * r[6] for r in rows if r[4] == r[1])
    nm = sum(1 for r in rows if r[4] == r[1])
    return (
        n, nm, round(smt / n, 6), round(swr / n, 6),
        round((smt + swr - swm) / n, 6),
    )


def test_hand_recomputation(spark):
    rows = _log(500)
    r = dr_offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt",
        "mu_t", "mu_l",
    ).collect()[0]
    assert (r.n, r.n_matched, r.v_dm, r.v_ips, r.v_dr) == _hand(rows)


def test_biased_model_correct_propensities(spark):
    """True target value is 1.0; the model says ~0.5-0.7. DM is badly
    biased; DR's correction recovers the truth within sampling
    noise (and matches IPS, which only needs propensities)."""
    rows = _log(4000)
    r = dr_offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt",
        "mu_t", "mu_l",
    ).collect()[0]
    assert r.v_dm < 0.75
    assert abs(r.v_dr - 1.0) < 0.1
    assert abs(r.v_dr - r.v_ips) < 0.1


def test_perfect_model_broken_propensities(spark):
    """Model = exact truth mu(x, a) = 1[a = best]; propensities
    replaced with garbage (all 0.9). IPS is badly off; DR's model
    term carries it to the truth (the OTHER robustness arm)."""
    rows = []
    for key in range(1, 3001):
        b = key % 4
        u = _u(key)
        a = 0 if u < 0.5 else (1 if u < 0.8 else 2)
        t = b % 3
        rows.append(
            (b, a, 0.9, 1 if a == t else 0, t,
             1.0, 1.0 if a == t else 0.0)
        )
    r = dr_offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt",
        "mu_t", "mu_l",
    ).collect()[0]
    assert abs(r.v_ips - 1.0) > 0.3   # junk propensities break IPS
    assert r.v_dr == pytest.approx(1.0, abs=1e-9)  # model carries DR


def test_sql_twin_matches_spark_exactly(spark):
    rows = _log(300)
    r = dr_offpolicy_eval(
        _df(spark, rows), "action", "prop", "reward", "tgt",
        "mu_t", "mu_l",
    ).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t0 (b BIGINT, action BIGINT, prop DOUBLE,"
        " reward BIGINT, tgt BIGINT, mu_t DOUBLE, mu_l DOUBLE)"
    )
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?, ?, ?, ?, ?, ?)", rows
    )
    row = con.execute(
        dr_offpolicy_eval_sql(
            "SELECT * FROM t0", "action", "prop", "reward", "tgt",
            "mu_t", "mu_l",
        )
    ).fetchone()
    assert row == (r.n, r.n_matched, r.v_dm, r.v_ips, r.v_dr)
