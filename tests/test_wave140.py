"""Wave 140 — Lepage combined location-scale two-sample test.

Hand-pinned tests for operators/evaluation.py lepage_test: W/AB sums
and both z's recomputed by hand, the scale-only alternative that
Wilcoxon alone misses (z_W ~ 0, z_AB large), the shift-only
alternative (z_W large), the even/odd Ansari-Bradley moment forms, and
SQL-twin equality. Spec: lepage_price_returnflag
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    lepage_test,
    lepage_test_sql,
)


def _df(spark, xs, ys):
    rows = [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys]
    return spark.createDataFrame(rows, "g boolean, v double")


def _hand(xs, ys):
    vals = sorted(
        [(v, True) for v in xs] + [(v, False) for v in ys],
        key=lambda t: (t[0], t[1]),
    )
    n, m = len(vals), len(xs)
    w = sum(r for r, (_, g) in enumerate(vals, 1) if g)
    ab = sum(min(r, n + 1 - r) for r, (_, g) in enumerate(vals, 1) if g)
    z_w = (w - m * (n + 1) / 2) / math.sqrt(m * (n - m) * (n + 1) / 12)
    if n % 2 == 0:
        mu = m * (n + 2) / 4
        var = m * (n - m) * (n + 2) * (n - 2) / (48 * (n - 1))
    else:
        mu = m * (n + 1) ** 2 / (4 * n)
        var = m * (n - m) * (n + 1) * (3 + n * n) / (48 * n * n)
    z_ab = (ab - mu) / math.sqrt(var)
    return w, ab, z_w, z_ab


@pytest.mark.parametrize("extra", [[], [99.5]])  # even and odd n
def test_hand_recomputation_even_and_odd(spark, extra):
    xs = [1.2, 3.4, 5.6, 7.8, 9.1]
    ys = [2.3, 4.5, 6.7, 8.9] + extra
    r = lepage_test(_df(spark, xs, ys), "g", "v").collect()[0]
    w, ab, z_w, z_ab = _hand(xs, ys)
    assert (r.n_x, r.n_y) == (len(xs), len(ys))
    assert (r.w_stat, r.ab_stat) == (w, ab)
    assert r.z_w == pytest.approx(round(z_w, 6), abs=1e-9)
    assert r.z_ab == pytest.approx(round(z_ab, 6), abs=1e-9)
    assert r.lepage_d == pytest.approx(round(z_w**2 + z_ab**2, 6), abs=1e-6)


def test_scale_change_invisible_to_wilcoxon(spark):
    """Same center, very different spread: |z_W| small, |z_AB| large —
    the case Lepage exists for."""
    xs = [50 - 40, 50 - 30, 50 - 20, 50 + 20, 50 + 30, 50 + 40]  # wide
    ys = [48, 49, 49.5, 50.5, 51, 52]  # narrow, same center
    r = lepage_test(_df(spark, xs, ys), "g", "v").collect()[0]
    assert abs(r.z_w) < 1.0
    assert abs(r.z_ab) > 2.0
    assert r.lepage_d > 4.0


def test_pure_shift_drives_zw(spark):
    xs = [101, 102, 103, 104, 105, 106]
    ys = [1, 2, 3, 4, 5, 6]
    r = lepage_test(_df(spark, xs, ys), "g", "v").collect()[0]
    assert r.z_w > 2.5


def test_sql_twin_matches_spark_exactly(spark):
    xs = [((i * 17) % 101) + 0.25 for i in range(40)]
    ys = [((i * 29) % 97) * 1.5 for i in range(35)]
    r = lepage_test(_df(spark, xs, ys), "g", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (g BOOLEAN, v DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)",
        [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys],
    )
    row = con.execute(
        lepage_test_sql("SELECT * FROM t0", "g", "v")
    ).fetchone()
    assert row == (
        r.n_x, r.n_y, r.w_stat, r.ab_stat, r.z_w, r.z_ab, r.lepage_d
    )
