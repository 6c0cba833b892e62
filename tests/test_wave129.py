"""Wave 129 — Cochran-Mantel-Haenszel stratified 2x2 analysis.

Hand-pinned tests for operators/probability.py mantel_haenszel: the
textbook Simpson's-paradox construction (crude OR reversed vs
stratified), exact recomputation of OR_MH and the CMH statistic from
cell counts, the homogeneous-strata case (OR_MH == per-stratum OR),
and SQL-twin equality. Spec: mantel_haenszel_segment_status
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.probability import (
    mantel_haenszel,
    mantel_haenszel_sql,
)


def _rows_from_cells(cells):
    """cells: {stratum: (a, b, c, d)} -> unit rows."""
    rows = []
    for s, (a, b, c, d) in cells.items():
        rows += [(s, True, True)] * a
        rows += [(s, True, False)] * b
        rows += [(s, False, True)] * c
        rows += [(s, False, False)] * d
    return rows


def _df(spark, cells):
    return spark.createDataFrame(
        _rows_from_cells(cells), "s string, e boolean, o boolean"
    )


def _hand(cells):
    s_ad = sum(a * d / (a + b + c + d) for a, b, c, d in cells.values())
    s_bc = sum(b * c / (a + b + c + d) for a, b, c, d in cells.values())
    s_a = sum(a for a, *_ in cells.values())
    s_ea = sum(
        (a + b) * (a + c) / (a + b + c + d) for a, b, c, d in cells.values()
    )
    s_va = sum(
        (a + b) * (c + d) * (a + c) * (b + d) / ((n := a + b + c + d) ** 2 * (n - 1))
        for a, b, c, d in cells.values()
    )
    return s_ad / s_bc, (s_a - s_ea) ** 2 / s_va


def test_or_and_cmh_recomputed_by_hand(spark):
    cells = {"s1": (12, 5, 7, 20), "s2": (30, 10, 8, 25)}
    r = mantel_haenszel(_df(spark, cells), "s", "e", "o").collect()[0]
    or_mh, cmh = _hand(cells)
    assert r.n_strata == 2
    assert r.n_total == sum(sum(c) for c in cells.values())
    assert r.or_mh == pytest.approx(round(or_mh, 6), abs=1e-9)
    assert r.cmh_stat == pytest.approx(round(cmh, 6), abs=1e-9)


def test_simpsons_paradox_guard(spark):
    """Within each stratum exposure HELPS (OR > 1), but stratum sizes
    are rigged so the crude pooled OR is < 1 — the exact trap OR_MH
    exists to avoid."""
    cells = {
        # exposure rare in the easy stratum, dominant in the hard one
        # (the kidney-stone-study structure): both strata OR = 2.25
        "easy": (18, 2, 160, 40),
        "hard": (20, 80, 2, 18),
    }  # pooled: (38*58)/(82*162) ~ 0.166 — direction reversed
    r = mantel_haenszel(_df(spark, cells), "s", "e", "o").collect()[0]
    assert r.or_mh > 1.0
    assert r.or_crude < 1.0


def test_homogeneous_strata_match_common_or(spark):
    """Identical 2x2 in every stratum: OR_MH equals the per-stratum
    OR exactly."""
    cell = (20, 10, 5, 15)  # OR = 6.0
    cells = {f"s{i}": cell for i in range(4)}
    r = mantel_haenszel(_df(spark, cells), "s", "e", "o").collect()[0]
    assert r.or_mh == pytest.approx(6.0, abs=1e-9)
    assert r.or_crude == pytest.approx(6.0, abs=1e-9)


def test_sql_twin_matches_spark_exactly(spark):
    cells = {"a": (12, 5, 7, 20), "b": (30, 10, 8, 25), "c": (3, 9, 11, 2)}
    r = mantel_haenszel(_df(spark, cells), "s", "e", "o").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (s VARCHAR, e BOOLEAN, o BOOLEAN)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?, ?)", _rows_from_cells(cells)
    )
    row = con.execute(
        mantel_haenszel_sql("SELECT * FROM t0", "s", "e", "o")
    ).fetchone()
    assert row == (r.n_strata, r.n_total, r.or_mh, r.cmh_stat, r.or_crude)
