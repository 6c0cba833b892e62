"""Wave 143 — Goodman-Kruskal lambda (nominal PRE association).

Hand-pinned tests for operators/evaluation.py goodman_kruskal_lambda:
the textbook PRE recomputation on a small table, the perfect-predictor
(lambda = 1) and mode-never-changes (lambda = 0 with dependence the
chi-square view still sees) cases, asymmetry, and SQL-twin equality.
Spec: gk_lambda_source_lang (plans/stats_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    goodman_kruskal_lambda,
    goodman_kruskal_lambda_sql,
)


def _df(spark, cells):
    rows = [(x, y) for (x, y), c in cells.items() for _ in range(c)]
    return spark.createDataFrame(rows, "x string, y string")


def _hand(cells):
    from collections import defaultdict

    n = sum(cells.values())
    rows, cols = defaultdict(dict), defaultdict(dict)
    for (x, y), c in cells.items():
        rows[x][y] = c
        cols[y][x] = c
    sum_rowmax = sum(max(d.values()) for d in rows.values())
    sum_colmax = sum(max(d.values()) for d in cols.values())
    marg_y = defaultdict(int)
    marg_x = defaultdict(int)
    for (x, y), c in cells.items():
        marg_y[y] += c
        marg_x[x] += c
    my, mx = max(marg_y.values()), max(marg_x.values())
    return (
        (sum_rowmax - my) / (n - my),
        (sum_colmax - mx) / (n - mx),
        (sum_rowmax + sum_colmax - my - mx) / (2 * n - my - mx),
    )


def test_textbook_recomputation(spark):
    cells = {
        ("a", "u"): 30, ("a", "v"): 10,
        ("b", "u"): 5, ("b", "v"): 25,
        ("c", "u"): 10, ("c", "v"): 10,
    }
    r = goodman_kruskal_lambda(_df(spark, cells), "x", "y").collect()[0]
    lyx, lxy, ls = _hand(cells)
    assert r.n == 90
    assert r.lambda_y_given_x == pytest.approx(round(lyx, 6), abs=1e-9)
    assert r.lambda_x_given_y == pytest.approx(round(lxy, 6), abs=1e-9)
    assert r.lambda_symmetric == pytest.approx(round(ls, 6), abs=1e-9)
    assert r.lambda_y_given_x != r.lambda_x_given_y  # lambda is asymmetric


def test_perfect_predictor_is_one(spark):
    cells = {("a", "u"): 20, ("b", "v"): 30, ("c", "w"): 10}
    r = goodman_kruskal_lambda(_df(spark, cells), "x", "y").collect()[0]
    assert r.lambda_y_given_x == 1.0


def test_mode_never_changes_is_zero_despite_dependence(spark):
    """Every x keeps the same modal y ('u'), so lambda_y|x = 0 even
    though the distribution clearly shifts with x — the exact case
    where entropy-based measures stay positive and lambda says the
    DECISION doesn't improve."""
    cells = {
        ("a", "u"): 50, ("a", "v"): 10,
        ("b", "u"): 30, ("b", "v"): 25,
    }
    r = goodman_kruskal_lambda(_df(spark, cells), "x", "y").collect()[0]
    assert r.lambda_y_given_x == 0.0


def test_sql_twin_matches_spark_exactly(spark):
    cells = {
        (f"s{i}", f"l{j}"): 1 + ((i * 5 + j * 3) % 13)
        for i in range(4)
        for j in range(5)
    }
    r = goodman_kruskal_lambda(_df(spark, cells), "x", "y").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (x VARCHAR, y VARCHAR)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)",
        [(x, y) for (x, y), c in cells.items() for _ in range(c)],
    )
    row = con.execute(
        goodman_kruskal_lambda_sql("SELECT * FROM t0", "x", "y")
    ).fetchone()
    assert row == (
        r.n, r.lambda_y_given_x, r.lambda_x_given_y, r.lambda_symmetric
    )
