"""Wave 133 — intraclass correlation + Kish design effect.

Hand-pinned tests for operators/survey.py icc_design_effect: the
unbalanced one-way ANOVA estimator recomputed by hand, the two
boundary regimes (between-cluster variance only -> ICC ~ 1, pure
within-cluster noise -> ICC ~ 0 and deff ~ 1), n_effective algebra,
and SQL-twin equality. Spec: icc_design_effect_users
(plans/ops_bi_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.survey import (
    icc_design_effect,
    icc_design_effect_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "c long, v double")


def _hand_icc(rows):
    from collections import defaultdict

    by = defaultdict(list)
    for c, v in rows:
        by[c].append(v)
    k, n = len(by), len(rows)
    g = sum(v for _, v in rows)
    ss_c = sum(sum(vs) ** 2 / len(vs) for vs in by.values())
    q = sum(v * v for _, v in rows)
    m2 = sum(len(vs) ** 2 for vs in by.values())
    msb = (ss_c - g * g / n) / (k - 1)
    msw = (q - ss_c) / (n - k)
    n0 = (n - m2 / n) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    deff = 1 + (n / k - 1) * icc
    return icc, deff


def test_estimator_recomputed_by_hand_unbalanced(spark):
    rows = (
        [(1, 10.0 + d) for d in (0.1, -0.2, 0.3)]
        + [(2, 20.0 + d) for d in (0.2, -0.1, 0.1, -0.2)]
        + [(3, 30.0 + d) for d in (-0.3, 0.3)]
    )
    r = icc_design_effect(_df(spark, rows), "c", "v").collect()[0]
    icc, deff = _hand_icc(rows)
    assert (r.n_obs, r.n_clusters) == (9, 3)
    assert r.icc == pytest.approx(round(icc, 6), abs=1e-9)
    assert r.deff == pytest.approx(round(deff, 6), abs=1e-9)
    assert r.n_effective == pytest.approx(round(9 / deff, 6), abs=1e-9)
    assert r.icc > 0.95  # clusters are far apart vs within-noise


def test_pure_noise_gives_icc_near_zero(spark):
    """Identical value pattern in every cluster: cluster means equal,
    so MSB ~ 0 and deff ~ 1 (no clustering penalty)."""
    pattern = [1.0, 2.0, 3.0, 4.0]
    rows = [(c, v) for c in range(8) for v in pattern]
    r = icc_design_effect(_df(spark, rows), "c", "v").collect()[0]
    assert r.icc < 0.0  # ANOVA estimator goes slightly negative here
    assert r.deff < 1.0
    assert r.mean_cluster_size == 4.0


def test_balanced_extreme_clustering(spark):
    """Constant within cluster, different across: MSW = 0 -> ICC = 1,
    deff = m."""
    rows = [(c, float(10 * c)) for c in range(5) for _ in range(6)]
    r = icc_design_effect(_df(spark, rows), "c", "v").collect()[0]
    assert r.icc == pytest.approx(1.0, abs=1e-9)
    assert r.deff == pytest.approx(6.0, abs=1e-9)
    assert r.n_effective == pytest.approx(5.0, abs=1e-9)


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (c, round(5.0 * c + ((c * 7 + j * 13) % 10) / 4.0, 2))
        for c in range(12)
        for j in range((c % 3) + 2)
    ]
    r = icc_design_effect(_df(spark, rows), "c", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (c BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    row = con.execute(
        icc_design_effect_sql("SELECT * FROM t0", "c", "v")
    ).fetchone()
    assert row == (
        r.n_obs, r.n_clusters, r.mean_cluster_size, r.icc, r.deff,
        r.n_effective,
    )
