"""Wave 147 — Mood squared-rank scale test.

Hand-pinned T/z recomputation with the general tie-exact linear-rank
moments over mid-rank scores, behavioral checks (a pure scale change
drives |z| while a pure shift leaves it small — the mirror image of
Wilcoxon), and SQL-twin equality with and without ties. Spec:
mood_scale_price_returnflag (plans/stats_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    mood_scale_test,
    mood_scale_test_sql,
)


def _df(spark, xs, ys):
    rows = [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys]
    return spark.createDataFrame(rows, "g boolean, v double")


def _hand(xs, ys):
    vals = sorted(
        [(v, True) for v in xs] + [(v, False) for v in ys],
        key=lambda t: (t[0], t[1]),
    )
    n, nx = len(vals), len(xs)
    byval: dict = {}
    for r, (v, g) in enumerate(vals, 1):
        byval.setdefault(v, []).append(r)
    mid = {v: sum(rs) / len(rs) for v, rs in byval.items()}
    score = {v: (m - (n + 1) / 2) ** 2 for v, m in mid.items()}
    t = sum(score[v] for v, g in vals if g)
    scores = [score[v] for v, _ in vals]
    sbar = sum(scores) / n
    ss = sum((s - sbar) ** 2 for s in scores)
    var = nx * (n - nx) / (n * (n - 1)) * ss
    return t, (t - nx * sbar) / math.sqrt(var)


def test_hand_recomputation_no_ties(spark):
    xs = [1.2, 3.4, 5.6, 7.8, 9.1, 11.0]
    ys = [2.3, 4.5, 6.7, 8.9, 10.2]
    r = mood_scale_test(_df(spark, xs, ys), "g", "v").collect()[0]
    t, z = _hand(xs, ys)
    assert (r.n_x, r.n_y) == (len(xs), len(ys))
    assert r.t_stat == pytest.approx(t, abs=1e-9)
    assert r.z_stat == pytest.approx(round(z, 6), abs=1e-9)


def test_hand_recomputation_ties(spark):
    xs = [1.0, 2.0, 2.0, 3.0, 5.0]
    ys = [2.0, 2.0, 4.0, 5.0]
    r = mood_scale_test(_df(spark, xs, ys), "g", "v").collect()[0]
    t, z = _hand(xs, ys)
    assert r.t_stat == pytest.approx(t, abs=1e-9)
    assert r.z_stat == pytest.approx(round(z, 6), abs=1e-9)


def test_scale_change_drives_z(spark):
    """Wide x vs narrow y at the same center: x's ranks sit at both
    EXTREMES, so its squared centered ranks are large -> z > 0 and
    clearly nonzero."""
    xs = [50 + d for d in (-40, -30, -20, 20, 30, 40)]
    ys = [48.0, 49.0, 49.5, 50.5, 51.0, 52.0]
    r = mood_scale_test(_df(spark, xs, ys), "g", "v").collect()[0]
    assert r.z_stat > 2.0


def test_pure_shift_is_invisible(spark):
    """Disjoint shift: sample x occupies ranks 7..12, y 1..6 — both
    samples' squared centered ranks are IDENTICAL multisets, so T sits
    exactly at its mean: z == 0. The exact blindness that mandates
    pairing mood_scale with a location test."""
    xs = [101.0, 102.0, 103.0, 104.0, 105.0, 106.0]
    ys = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    r = mood_scale_test(_df(spark, xs, ys), "g", "v").collect()[0]
    assert r.z_stat == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize("tied", [False, True])
def test_sql_twin_matches_spark_exactly(spark, tied):
    if tied:
        xs = [round(((i * 7) % 13) * 0.25, 2) for i in range(30)]
        ys = [round(((i * 5) % 11) * 0.25, 2) for i in range(25)]
    else:
        xs = [((i * 17) % 101) + 0.25 for i in range(40)]
        ys = [((i * 29) % 97) * 1.5 for i in range(35)]
    r = mood_scale_test(_df(spark, xs, ys), "g", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (g BOOLEAN, v DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)",
        [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys],
    )
    row = con.execute(
        mood_scale_test_sql("SELECT * FROM t0", "g", "v")
    ).fetchone()
    assert row == (r.n_x, r.n_y, r.t_stat, r.z_stat)
