"""Wave 131 — calibration diagnostics (ECE + Brier decomposition).

Hand-pinned tests for operators/calibration.py calibration_report:
perfectly calibrated bin-constant fixture (ECE = reliability = 0,
Murphy identity exact), a deliberately miscalibrated fixture with ECE
recomputed by hand, the bins=1 degenerate case (resolution = 0), the
s=1.0 clamp, and SQL-twin equality. Spec: calibration_langid_score
(plans/text_analytics.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.calibration import (
    calibration_report,
    calibration_report_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, label boolean")


def _mk(score, n_pos, n_neg):
    return [(score, True)] * n_pos + [(score, False)] * n_neg


def test_perfectly_calibrated_bin_constant(spark):
    """Scores 0.25 (1/4 positive) and 0.75 (3/4 positive): per-bin
    conf == acc exactly, so ECE = reliability = 0 and the Murphy
    identity brier = rel - res + unc holds exactly."""
    rows = _mk(0.25, 1, 3) + _mk(0.75, 3, 1)
    r = calibration_report(_df(spark, rows), "score", "label").collect()[0]
    assert (r.n, r.n_bins_used) == (8, 2)
    assert r.ece == 0.0 and r.reliability == 0.0
    assert r.brier == pytest.approx(
        round(r.reliability - r.resolution + r.uncertainty, 6), abs=2e-6
    )
    # hand: ybar = 0.5 -> unc 0.25; res = mean (acc_b - .5)^2 = 0.0625
    assert r.uncertainty == 0.25
    assert r.resolution == 0.0625
    assert r.brier == pytest.approx(0.25 - 0.0625, abs=1e-9)


def test_miscalibrated_ece_by_hand(spark):
    """All scores 0.9 but only half are positive: ECE = |0.9 - 0.5| =
    0.4; brier = mean(0.9-y)^2 = (0.81 + 0.01)/2 = 0.41."""
    rows = _mk(0.9, 5, 5)
    r = calibration_report(_df(spark, rows), "score", "label").collect()[0]
    assert r.ece == pytest.approx(0.4, abs=1e-9)
    assert r.reliability == pytest.approx(0.16, abs=1e-9)
    assert r.brier == pytest.approx(0.41, abs=1e-9)
    assert r.resolution == 0.0 and r.uncertainty == 0.25


def test_score_one_lands_in_last_bin(spark):
    rows = _mk(1.0, 3, 0) + _mk(0.05, 0, 3)
    r = calibration_report(_df(spark, rows), "score", "label").collect()[0]
    # s=1.0 clamps into bin 9 (not a phantom bin 10), so exactly two
    # bins exist; ECE = (3/6)*|1-1| + (3/6)*|0.05-0| = 0.025
    assert r.n_bins_used == 2
    assert r.ece == pytest.approx(0.025, abs=1e-9)


def test_within_bin_variance_gap(spark):
    """Non-bin-constant scores: the generalized Murphy identity is
    brier = rel - res + unc + WBV - 2·WBCov (within-bin score variance
    minus twice the within-bin score/outcome covariance). For this
    fixture WBV = 0.00125, WBCov = 0.0025, so the gap is exactly
    -0.00375 — recomputed by hand."""
    rows = _mk(0.62, 1, 0) + _mk(0.68, 0, 1) + _mk(0.11, 0, 1) + _mk(0.19, 1, 0)
    r = calibration_report(_df(spark, rows), "score", "label").collect()[0]
    gap = r.brier - (r.reliability - r.resolution + r.uncertainty)
    assert gap == pytest.approx(-0.00375, abs=1e-9)


def test_sql_twin_matches_spark_exactly(spark):
    rows = [
        (round(((i * 37) % 100) / 100.0, 4), (i * 13) % 3 == 0)
        for i in range(200)
    ]
    r = calibration_report(_df(spark, rows), "score", "label").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (score DOUBLE, label BOOLEAN)")
    con.executemany("INSERT INTO t0 VALUES (?, ?)", rows)
    row = con.execute(
        calibration_report_sql("SELECT * FROM t0", "score", "label")
    ).fetchone()
    assert row == (
        r.n, r.n_bins_used, r.brier, r.reliability, r.resolution,
        r.uncertainty, r.ece,
    )
