"""Wave 151 — Hodges-Lehmann two-sample shift estimator.

Brute-force pin (the histogram-space weighted median must equal the
literal median of all m*n pairwise differences), odd/even pair-count
median conventions, a planted-shift recovery with outliers (the
robustness HL exists for — the mean gap is dragged, HL is not), tie
handling, and SQL-twin equality. Spec: hl_shift_supplier_acctbal
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import statistics

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    hodges_lehmann_shift,
    hodges_lehmann_shift_sql,
)


def _df(spark, xs, ys):
    rows = [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys]
    return spark.createDataFrame(rows, "g boolean, v double")


def _brute(xs, ys):
    diffs = sorted(round(x - y, 2) for x in xs for y in ys)
    return statistics.median(diffs)


@pytest.mark.parametrize(
    "xs,ys",
    [
        ([1.0, 5.0, 7.25], [2.0, 3.5]),          # 6 pairs (even)
        ([1.0, 5.0, 7.25], [2.0, 3.5, 9.0]),     # 9 pairs (odd)
        ([1.0, 1.0, 2.0, 5.0], [2.0, 2.0, 3.0]),  # ties both sides
    ],
)
def test_matches_brute_force(spark, xs, ys):
    r = hodges_lehmann_shift(_df(spark, xs, ys), "g", "v").collect()[0]
    assert (r.n_x, r.n_y, r.n_pairs) == (len(xs), len(ys), len(xs) * len(ys))
    assert r.hl_shift == pytest.approx(_brute(xs, ys), abs=1e-9)


def test_planted_shift_robust_to_outliers(spark):
    ys = [float(v) for v in range(1, 41)]
    xs = [v + 7.5 for v in ys]
    xs[0] = 10_000.0  # one wild outlier
    r = hodges_lehmann_shift(_df(spark, xs, ys), "g", "v").collect()[0]
    mean_gap = sum(xs) / len(xs) - sum(ys) / len(ys)
    assert r.hl_shift == pytest.approx(_brute(xs, ys), abs=1e-9)
    # replacing one x by the outlier nudges the pair-median one step
    # (8.5) but no further — vs the mean gap's 200+ point blowout
    assert abs(r.hl_shift - 7.5) <= 1.5     # HL stays on the shift
    assert mean_gap > 200.0                  # the mean does not


def test_sql_twin_matches_spark_exactly(spark):
    xs = [round(((i * 17) % 101) * 0.25, 2) for i in range(40)]
    ys = [round(((i * 29) % 97) * 0.5, 2) for i in range(35)]
    r = hodges_lehmann_shift(_df(spark, xs, ys), "g", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (g BOOLEAN, v DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)",
        [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys],
    )
    row = con.execute(
        hodges_lehmann_shift_sql("SELECT * FROM t0", "g", "v")
    ).fetchone()
    assert row == (r.n_x, r.n_y, r.n_pairs, r.hl_shift)
