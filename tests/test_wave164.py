"""Wave 164 — WOE / Information Value feature audit.

Hand-pinned WOE/IV recomputation with Laplace smoothing, the
discrimination ordering property (a perfectly-separating feature's IV
dwarfs an independent one's), the one-sided-category finiteness the
smoothing exists for, total-row bookkeeping, and SQL-twin equality.
Spec: woe_iv_priority_status (plans/ops_bi_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.encoding import (
    woe_iv_audit,
    woe_iv_audit_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "c string, y boolean")


def _hand(rows, lp=0.5):
    cats = sorted({c for c, _ in rows})
    te = sum(1 for _, y in rows if y)
    tn = len(rows) - te
    out = {}
    iv = 0.0
    for c in cats:
        e = sum(1 for cc, y in rows if cc == c and y)
        n = sum(1 for cc, y in rows if cc == c and not y)
        ge = (e + lp) / (te + lp)
        gn = (n + lp) / (tn + lp)
        w = math.log(ge / gn)
        t = (ge - gn) * w
        iv += t
        out[c] = (e, n, round(w, 6), round(t, 6))
    return out, te, tn, round(iv, 6)


def test_hand_recomputation_and_total(spark):
    rows = [("abc"[(i * 7) % 3], (i * 5) % 3 == 0) for i in range(90)]
    got = woe_iv_audit(_df(spark, rows), "c", "y").collect()
    hand, te, tn, iv = _hand(rows)
    assert {
        r.category: (r.n_event, r.n_nonevent, r.woe, r.iv_term)
        for r in got
        if r.category is not None
    } == hand
    total = [r for r in got if r.category is None]
    assert len(total) == 1 and got[-1].category is None  # ordered last
    assert (total[0].n_event, total[0].n_nonevent) == (te, tn)
    assert total[0].iv_term == pytest.approx(iv, abs=1e-9)
    assert total[0].woe is None


def test_discrimination_ordering_and_one_sided_finiteness(spark):
    # 'sep' perfectly separates; one category is PURE-event (the
    # unsmoothed WOE would be +inf)
    sep = [("hi", True)] * 40 + [("lo", False)] * 40
    indep = [("ab"[i % 2], i % 3 == 0) for i in range(80)]
    r_sep = woe_iv_audit(_df(spark, sep), "c", "y").collect()
    r_ind = woe_iv_audit(_df(spark, indep), "c", "y").collect()
    iv_sep = [r for r in r_sep if r.category is None][0].iv_term
    iv_ind = [r for r in r_ind if r.category is None][0].iv_term
    assert all(
        math.isfinite(r.woe) for r in r_sep if r.category is not None
    )
    assert iv_sep > 3.0
    assert iv_ind < 0.1
    assert iv_sep > 20 * iv_ind


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        ("pqrs"[(i * 11) % 4], (i * 7) % 5 < 2) for i in range(160)
    ]
    r = woe_iv_audit(_df(spark, rows), "c", "y").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (c VARCHAR, y BOOLEAN)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    got = con.execute(woe_iv_audit_sql("t0", "c", "y")).fetchall()
    assert got == [
        (x.category, x.n_event, x.n_nonevent, x.woe, x.iv_term)
        for x in r
    ]
