"""Wave 146 — Cucconi squared-ranks location-scale two-sample test.

Hand-pinned U*/V*/rho/C recomputation (mid-rank scores, classical
continuity moments), behavioral checks (pure shift drives C through
U*/V* asymmetry; pure scale change — invisible to Wilcoxon — drives C
via both tails), the exact-bigint V4 expansion identity, and SQL-twin
equality with and without heavy ties. Spec: cucconi_price_returnflag
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    cucconi_test,
    cucconi_test_sql,
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
    u = sum(mid[v] ** 2 for v, g in vals if g)
    vv = sum((n + 1 - mid[v]) ** 2 for v, g in vals if g)
    eu = nx * (n + 1) * (2 * n + 1) / 6
    var = (n - nx) * nx * (n + 1) * (2 * n + 1) * (8 * n + 11) / 180
    us, vs = (u - eu) / math.sqrt(var), (vv - eu) / math.sqrt(var)
    rho = 2 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    c = (us * us + vs * vs - 2 * rho * us * vs) / (2 * (1 - rho * rho))
    return us, vs, c


def test_hand_recomputation(spark):
    xs = [1.2, 3.4, 5.6, 7.8, 9.1, 11.0]
    ys = [2.3, 4.5, 6.7, 8.9, 10.2]
    r = cucconi_test(_df(spark, xs, ys), "g", "v").collect()[0]
    us, vs, c = _hand(xs, ys)
    assert (r.n_x, r.n_y) == (len(xs), len(ys))
    assert r.u_star == pytest.approx(round(us, 6), abs=1e-9)
    assert r.v_star == pytest.approx(round(vs, 6), abs=1e-9)
    assert r.c_stat == pytest.approx(round(c, 6), abs=1e-9)


def test_v4_expansion_identity(spark):
    """V computed via the bigint expansion must equal the direct
    reversed-rank sum — checked through the hand recomputation under
    ties (where mid-ranks make the identity non-trivial)."""
    xs = [1.0, 2.0, 2.0, 3.0, 5.0]
    ys = [2.0, 2.0, 4.0, 5.0]
    r = cucconi_test(_df(spark, xs, ys), "g", "v").collect()[0]
    us, vs, c = _hand(xs, ys)
    assert r.u_star == pytest.approx(round(us, 6), abs=1e-9)
    assert r.v_star == pytest.approx(round(vs, 6), abs=1e-9)
    assert r.c_stat == pytest.approx(round(c, 6), abs=1e-9)


def test_scale_change_detected(spark):
    """Same center, different spread: C must be large (the case that
    motivates a location-scale test)."""
    xs = [50 + d for d in (-40, -30, -20, 20, 30, 40)]
    ys = [48.0, 49.0, 49.5, 50.5, 51.0, 52.0]
    r = cucconi_test(_df(spark, xs, ys), "g", "v").collect()[0]
    assert r.c_stat > 2.0


def test_pure_shift_detected(spark):
    xs = [101.0, 102.0, 103.0, 104.0, 105.0, 106.0]
    ys = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    r = cucconi_test(_df(spark, xs, ys), "g", "v").collect()[0]
    assert r.c_stat > 3.0


def test_null_case_small(spark):
    """Interleaved identical-law samples: C near its null scale."""
    xs = [1.0, 3.0, 5.0, 7.0, 9.0, 11.0]
    ys = [2.0, 4.0, 6.0, 8.0, 10.0, 12.0]
    r = cucconi_test(_df(spark, xs, ys), "g", "v").collect()[0]
    assert r.c_stat < 1.5


@pytest.mark.parametrize("tied", [False, True])
def test_sql_twin_matches_spark_exactly(spark, tied):
    if tied:
        xs = [round(((i * 7) % 13) * 0.25, 2) for i in range(30)]
        ys = [round(((i * 5) % 11) * 0.25, 2) for i in range(25)]
    else:
        xs = [((i * 17) % 101) + 0.25 for i in range(40)]
        ys = [((i * 29) % 97) * 1.5 for i in range(35)]
    r = cucconi_test(_df(spark, xs, ys), "g", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (g BOOLEAN, v DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?)",
        [(True, float(v)) for v in xs] + [(False, float(v)) for v in ys],
    )
    row = con.execute(
        cucconi_test_sql("SELECT * FROM t0", "g", "v")
    ).fetchone()
    assert row == (r.n_x, r.n_y, r.u_star, r.v_star, r.c_stat)
