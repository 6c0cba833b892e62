"""Wave 173 — Stuart-Maxwell marginal-homogeneity test.

Hand-pinned chi-square recomputation against the matrix definition
(numpy inverse), the paired-structure property (a shift the paired
test sees at chi2 >> critical while the MARGINS alone look similar),
k=2 degeneration consistency with McNemar, NULL on perfect symmetry,
and SQL-twin equality. Spec: stuart_maxwell_entry_exit
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import numpy as np
import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    stuart_maxwell_test,
    stuart_maxwell_test_sql,
)

_CATS = ("a", "b", "c")


def _df(spark, pairs):
    return spark.createDataFrame(
        [(i, f, s) for i, (f, s) in enumerate(pairs)],
        "u long, f string, s string",
    )


def _hand(pairs):
    idx = {c: i for i, c in enumerate(_CATS)}
    nmat = np.zeros((3, 3))
    for f, s in pairs:
        nmat[idx[f], idx[s]] += 1
    d = nmat.sum(axis=1) - nmat.sum(axis=0)
    s_mat = np.zeros((2, 2))
    for i in range(2):
        s_mat[i, i] = (
            nmat.sum(axis=1)[i] + nmat.sum(axis=0)[i] - 2 * nmat[i, i]
        )
    s_mat[0, 1] = s_mat[1, 0] = -(nmat[0, 1] + nmat[1, 0])
    if np.linalg.det(s_mat) <= 0:
        return d, None
    chi2 = d[:2] @ np.linalg.inv(s_mat) @ d[:2]
    return d, round(float(chi2), 6)


def test_hand_recomputation(spark):
    pairs = []
    for i in range(90):
        f = _CATS[(i * 7) % 3]
        s = _CATS[(i * 5 + i // 9) % 3]
        pairs.append((f, s))
    r = stuart_maxwell_test(
        _df(spark, pairs), "u", "f", "s", _CATS
    ).collect()[0]
    d, chi2 = _hand(pairs)
    assert (r.d1, r.d2, r.d3) == tuple(int(x) for x in d)
    assert r.n_pairs == 90
    assert r.sm_chi2 == pytest.approx(chi2, abs=1e-6)


def test_paired_shift_detected(spark):
    """Circular a->b->c drift touching every category (movement
    confined to two categories makes S singular — the test then
    properly degenerates to McNemar, covered below): the paired test
    lights up."""
    pairs = (
        [("a", "b")] * 30 + [("b", "c")] * 12 + [("c", "a")] * 4
        + [("a", "a")] * 10 + [("b", "b")] * 10 + [("c", "c")] * 10
    )
    r = stuart_maxwell_test(
        _df(spark, pairs), "u", "f", "s", _CATS
    ).collect()[0]
    d, chi2 = _hand(pairs)
    assert r.sm_chi2 == pytest.approx(chi2, abs=1e-6)
    assert r.sm_chi2 > 15.0


def test_two_category_movement_degenerates_to_null(spark):
    """ALL movement inside {a, b} forces d1 = -d2 and a singular S
    (the 2-dof test collapses to McNemar's 1 dof): NULL by contract
    — the consumer should fall back to mcnemar_gates."""
    pairs = [("a", "b")] * 10 + [("b", "a")] * 4 + [("c", "c")] * 5
    r = stuart_maxwell_test(
        _df(spark, pairs), "u", "f", "s", _CATS
    ).collect()[0]
    assert r.sm_chi2 is None


def test_singular_covariance_is_null(spark):
    """All mass on the diagonal: S = 0, no information about
    off-diagonal movement -> NULL by contract."""
    pairs = [("a", "a")] * 10 + [("b", "b")] * 10
    r = stuart_maxwell_test(
        _df(spark, pairs), "u", "f", "s", _CATS
    ).collect()[0]
    assert r.sm_chi2 is None


def test_sql_twin_matches_spark_exactly(spark):
    pairs = [
        (_CATS[(i * 11) % 3], _CATS[(i * 13 + i // 7) % 3])
        for i in range(120)
    ]
    r = stuart_maxwell_test(
        _df(spark, pairs), "u", "f", "s", _CATS
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (u BIGINT, f VARCHAR, s VARCHAR)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?, ?)",
        [(i, f, s) for i, (f, s) in enumerate(pairs)],
    )
    row = con.execute(
        stuart_maxwell_test_sql("SELECT * FROM t0", "f", "s", _CATS)
    ).fetchone()
    assert row == (r.n_pairs, r.d1, r.d2, r.d3, r.sm_chi2)
