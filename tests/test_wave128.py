"""Wave 128 — Cameron-Trivedi overdispersion test for count series.

Hand-pinned tests for operators/timeseries.py overdispersion_test: the
statistic recomputed by hand on a small fixture, sign behavior on
equidispersed vs overdispersed series, the integer-exactness identity
Q = n²S2 - nS², and SQL-twin equality. Spec:
overdispersion_event_counts (plans/timeseries_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.timeseries import (
    overdispersion_test,
    overdispersion_test_sql,
)


def _daily(spark, series):
    rows = [
        (g, d, int(c)) for g, cs in series.items() for d, c in enumerate(cs)
    ]
    return spark.createDataFrame(rows, "event_type string, day long, c long")


def _hand_ct(cs):
    n, s = len(cs), sum(cs)
    mu = s / n
    num = sum((y - mu) ** 2 - y for y in cs)
    den = math.sqrt(2 * n * mu * mu)
    return num / den, (sum((y - mu) ** 2 for y in cs) / (n - 1)) / mu


def test_statistic_recomputed_by_hand(spark):
    cs = [12, 5, 30, 2, 25, 7, 40, 3]  # wildly overdispersed
    out = overdispersion_test(_daily(spark, {"a": cs})).collect()[0]
    ct, disp = _hand_ct(cs)
    assert out.n_days == 8
    assert out.mean_count == pytest.approx(round(sum(cs) / 8, 6))
    assert out.ct_stat == pytest.approx(round(ct, 6), abs=1e-9)
    assert out.dispersion_index == pytest.approx(round(disp, 6), abs=1e-9)
    assert out.overdispersed is True


def test_equidispersed_series_not_flagged(spark):
    """Counts hugging the mean: variance << mean, T strongly negative."""
    cs = [10, 10, 11, 9, 10, 10, 9, 11, 10, 10]
    out = overdispersion_test(_daily(spark, {"a": cs})).collect()[0]
    assert out.ct_stat < 0
    assert out.overdispersed is False
    assert out.dispersion_index < 1.0


def test_q_identity_matches_definition():
    """n²·S2 - n·S² must equal n²·Σ(y-μ)² exactly (the closed form the
    operator uses instead of accumulating doubles)."""
    cs = [3, 7, 2, 9, 5]
    n, s = len(cs), sum(cs)
    s2 = sum(y * y for y in cs)
    q = n * n * s2 - n * s * s
    mu = s / n
    assert q / (n * n) == pytest.approx(sum((y - mu) ** 2 for y in cs))


def test_groups_independent_and_ordered(spark):
    series = {"b": [5, 50, 2, 60], "a": [10, 10, 10, 10]}
    out = overdispersion_test(_daily(spark, series)).collect()
    assert [r.event_type for r in out] == ["a", "b"]
    assert out[0].overdispersed is False and out[1].overdispersed is True


def test_sql_twin_matches_spark_exactly(spark):
    series = {
        "x": [12, 5, 30, 2, 25, 7, 40, 3],
        "y": [8, 9, 8, 10, 9, 8, 9, 9, 10],
    }
    s_rows = [
        tuple(r) for r in overdispersion_test(_daily(spark, series)).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (event_type VARCHAR, day BIGINT, c BIGINT)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?, ?)",
        [(g, d, c) for g, cs in series.items() for d, c in enumerate(cs)],
    )
    d_rows = con.execute(
        overdispersion_test_sql("SELECT * FROM t0")
    ).fetchall()
    assert s_rows == d_rows
