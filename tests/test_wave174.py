"""Wave 174 — DeLong CI for AUC.

Brute-force pin: placement values, S10/S01 and the SE recomputed from
the DEFINITIONAL per-observation formulation (not the rollup) on a
tied fixture — the distinct-score rollup must agree exactly; the AUC
itself must equal the suite's rank-sum AUC; CI behavior (width
shrinks ~1/sqrt(n); a perfect separator has SE 0 with a degenerate
[1,1] interval); and SQL-twin equality. Spec: auc_delong_ci_quality
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    auc_delong_ci,
    auc_delong_ci_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "s double, y boolean")


def _hand(rows):
    pos = sorted(s for s, y in rows if y)
    neg = sorted(s for s, y in rows if not y)
    n1, n0 = len(pos), len(neg)
    def v10(s):
        return (
            sum(1 for t in neg if t < s) + 0.5 * sum(1 for t in neg if t == s)
        ) / n0
    def v01(s):
        return (
            sum(1 for t in pos if t > s) + 0.5 * sum(1 for t in pos if t == s)
        ) / n1
    vs10 = [v10(s) for s in pos]
    vs01 = [v01(s) for s in neg]
    auc = sum(vs10) / n1
    m10 = sum(vs10) / n1
    m01 = sum(vs01) / n0
    s10 = sum((v - m10) ** 2 for v in vs10) / (n1 - 1)
    s01 = sum((v - m01) ** 2 for v in vs01) / (n0 - 1)
    se = math.sqrt(s10 / n1 + s01 / n0)
    z = 1.959963984540054
    return (
        n1, n0, round(auc, 6), round(se, 6),
        round(auc - z * se, 6), round(auc + z * se, 6),
    )


def test_definitional_recomputation_with_ties(spark):
    rows = []
    for i in range(200):
        s = float((i * 7) % 23)  # heavy ties
        y = ((i * 11) % 23) > 8 + (i % 5)
        rows.append((s, y))
    r = auc_delong_ci(_df(spark, rows), "s", "y").collect()[0]
    assert (
        r.n_pos, r.n_neg, r.auc, r.se_delong, r.ci_lo, r.ci_hi
    ) == _hand(rows)


def test_ci_narrows_with_n_and_perfect_separator(spark):
    def mk(n):
        return [
            (float((i * 13) % 50 + (10 if (i * 7) % 3 == 0 else 0)),
             (i * 7) % 3 == 0)
            for i in range(n)
        ]
    r_small = auc_delong_ci(_df(spark, mk(60)), "s", "y").collect()[0]
    r_big = auc_delong_ci(_df(spark, mk(600)), "s", "y").collect()[0]
    assert (r_big.ci_hi - r_big.ci_lo) < (r_small.ci_hi - r_small.ci_lo)
    perfect = [(float(i), i >= 50) for i in range(100)]
    r_p = auc_delong_ci(_df(spark, perfect), "s", "y").collect()[0]
    assert r_p.auc == 1.0 and r_p.se_delong == 0.0
    assert (r_p.ci_lo, r_p.ci_hi) == (1.0, 1.0)


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (float((i * 17) % 37), (i * 5) % 7 < 3) for i in range(300)
    ]
    r = auc_delong_ci(_df(spark, rows), "s", "y").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (s DOUBLE, y BOOLEAN)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    row = con.execute(
        auc_delong_ci_sql("t0", "s", "y")
    ).fetchone()
    assert row == (
        r.n_pos, r.n_neg, r.auc, r.se_delong, r.ci_lo, r.ci_hi
    )
