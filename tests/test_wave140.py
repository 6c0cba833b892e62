"""Wave 140 — Lepage combined location-scale two-sample test.

Hand-pinned tests for operators/evaluation.py lepage_test: W/AB sums
and both z's recomputed by hand (r8: MID-RANK scores with the general
two-sample linear-rank moments — exact under ties, reducing to the
classic closed forms without them; ADVICE r7 #2), the scale-only
alternative that Wilcoxon alone misses (z_W ~ 0, z_AB large), the
shift-only alternative (z_W large), a heavy-tie pin, and SQL-twin
equality. Spec: lepage_price_returnflag (plans/stats_specs.py), gated
in tests/test_contract.py.
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
    """Mid-rank scores + general two-sample linear-rank moments:
    E[T] = m*mean(s), Var[T] = m*(n-m)/(n*(n-1)) * SS(s)."""
    vals = sorted(
        [(v, True) for v in xs] + [(v, False) for v in ys],
        key=lambda t: (t[0], t[1]),
    )
    n, m = len(vals), len(xs)
    byval: dict = {}
    for r, (v, g) in enumerate(vals, 1):
        byval.setdefault(v, []).append(r)
    mid, fold = {}, {}
    for v, rs in byval.items():
        mid[v] = sum(rs) / len(rs)
        fold[v] = sum(min(r, n + 1 - r) for r in rs) / len(rs)
    w = sum(mid[v] for v, g in vals if g)
    ab = sum(fold[v] for v, g in vals if g)

    def _z(stat, scores):
        sbar = sum(scores) / n
        ss = sum((s - sbar) ** 2 for s in scores)
        var = m * (n - m) / (n * (n - 1)) * ss
        return (stat - m * sbar) / math.sqrt(var)

    z_w = _z(w, [mid[v] for v, _ in vals])
    z_ab = _z(ab, [fold[v] for v, _ in vals])
    return w, ab, z_w, z_ab


@pytest.mark.parametrize("extra", [[], [99.5]])  # even and odd n
def test_hand_recomputation_even_and_odd(spark, extra):
    xs = [1.2, 3.4, 5.6, 7.8, 9.1]
    ys = [2.3, 4.5, 6.7, 8.9] + extra
    r = lepage_test(_df(spark, xs, ys), "g", "v").collect()[0]
    w, ab, z_w, z_ab = _hand(xs, ys)
    assert (r.n_x, r.n_y) == (len(xs), len(ys))
    assert r.w_stat == w
    assert r.ab_mean == pytest.approx(round(ab / len(xs), 6), abs=1e-9)
    assert r.z_w == pytest.approx(round(z_w, 6), abs=1e-9)
    assert r.z_ab == pytest.approx(round(z_ab, 6), abs=1e-9)
    assert r.lepage_d == pytest.approx(round(z_w**2 + z_ab**2, 6), abs=1e-6)


def test_ties_use_midranks(spark):
    """Cross-group ties get the SAME (mid-rank) score in both groups —
    the r7 row_number form always ranked FALSE below TRUE at equal
    values, biasing W; and the tie-corrected variance shrinks vs the
    no-tie closed form."""
    xs = [1.0, 2.0, 2.0, 3.0]
    ys = [2.0, 2.0, 4.0]
    r = lepage_test(_df(spark, xs, ys), "g", "v").collect()[0]
    w, ab, z_w, z_ab = _hand(xs, ys)
    # ranks: 1 | tie-run {2.0}x4 at ranks 2-5 -> mid 3.5 | 6 | 7
    assert r.w_stat == 1 + 3.5 + 3.5 + 6 == w
    assert r.z_w == pytest.approx(round(z_w, 6), abs=1e-9)
    assert r.z_ab == pytest.approx(round(z_ab, 6), abs=1e-9)
    # tie-corrected Wilcoxon variance must be SMALLER than the no-tie
    # closed form m*(n-m)*(n+1)/12
    n, m = 7, 4
    var_noties = m * (n - m) * (n + 1) / 12
    mids = [1, 3.5, 3.5, 3.5, 3.5, 6, 7]
    sbar = sum(mids) / n
    var_tied = m * (n - m) / (n * (n - 1)) * sum((s - sbar) ** 2 for s in mids)
    assert var_tied < var_noties


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
        r.n_x, r.n_y, r.w_stat, r.ab_mean, r.z_w, r.z_ab, r.lepage_d
    )


def test_sql_twin_matches_under_heavy_ties(spark):
    """2-dp-style duplicated values (the spec's real tie density):
    twin equality must hold with mid-ranks in play."""
    xs = [round(((i * 7) % 13) * 0.25, 2) for i in range(30)]
    ys = [round(((i * 5) % 11) * 0.25, 2) for i in range(25)]
    r = lepage_test(_df(spark, xs, ys), "g", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (g BOOLEAN, v DOUBLE)")
    con.executemany(
        "INSERT INTO t1 VALUES (?, ?)",
        [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys],
    )
    row = con.execute(
        lepage_test_sql("SELECT * FROM t1", "g", "v")
    ).fetchone()
    assert row == (
        r.n_x, r.n_y, r.w_stat, r.ab_mean, r.z_w, r.z_ab, r.lepage_d
    )
