"""Wave-109 hand pins: closed-form Fisher LDA and inclusion-
dependency discovery. LDA against a numpy closed-form reference on
separable two-feature Gaussians (axis, threshold, Fisher J, high
accuracy) plus the rotation case where neither single feature
separates but the LDA axis does; IND against planted violations and
full containment.

Covered spec names: lda_returnflag_axis, inclusion_dependency_sweep.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcas_question2_etl_spark.ml.lda import lda_two_feature
from mcas_question2_etl_spark.operators.profiling import (
    inclusion_dependency_report,
)


def _pts_df(spark, x0, x1):
    rows = [(0, float(a), float(b)) for a, b in x0] + [
        (1, float(a), float(b)) for a, b in x1
    ]
    return spark.createDataFrame(rows, "c int, x1 double, x2 double")


def _lda_ref(x0, x1):
    x0 = np.asarray(x0, dtype=float)
    x1 = np.asarray(x1, dtype=float)
    mu0, mu1 = x0.mean(0), x1.mean(0)
    s0 = (x0 - mu0).T @ (x0 - mu0)
    s1 = (x1 - mu1).T @ (x1 - mu1)
    sw = s0 + s1
    w = np.linalg.solve(sw, mu1 - mu0)
    thr = w @ (mu0 + mu1) / 2.0
    fj = (w @ (mu1 - mu0)) ** 2 / (w @ sw @ w)
    preds0 = (x0 @ w > thr).sum()
    preds1 = (x1 @ w > thr).sum()
    acc = ((len(x0) - preds0) + preds1) / (len(x0) + len(x1))
    return w, thr, fj, acc


def test_lda_matches_reference_separable(spark):
    rng = np.random.RandomState(17)
    x0 = rng.randn(120, 2) + np.array([0.0, 0.0])
    x1 = rng.randn(100, 2) + np.array([4.0, 2.0])
    out = lda_two_feature(
        _pts_df(spark, x0, x1), F.col("c") == 1, "x1", "x2"
    ).collect()[0]
    w, thr, fj, acc = _lda_ref(x0, x1)
    assert out.n0 == 120
    assert out.n1 == 100
    assert out.w1 == pytest.approx(w[0], abs=1e-6)
    assert out.w2 == pytest.approx(w[1], abs=1e-6)
    assert out.threshold == pytest.approx(thr, abs=1e-6)
    assert out.fisher_j == pytest.approx(fj, abs=1e-6)
    assert out.accuracy == pytest.approx(acc, abs=1e-6)
    assert out.accuracy > 0.95


def test_lda_needs_both_features(spark):
    # classes separated along the (1, -1) diagonal with strong shared
    # covariance: each marginal overlaps heavily, the LDA axis
    # separates nearly perfectly (the case a per-feature stump loses)
    rng = np.random.RandomState(5)
    common = rng.randn(150) * 3.0
    x0 = np.column_stack([common + rng.randn(150) * 0.3,
                          common - 1.0 + rng.randn(150) * 0.3])
    common2 = rng.randn(150) * 3.0
    x1 = np.column_stack([common2 + rng.randn(150) * 0.3,
                          common2 + 1.0 + rng.randn(150) * 0.3])
    out = lda_two_feature(
        _pts_df(spark, x0, x1), F.col("c") == 1, "x1", "x2"
    ).collect()[0]
    _, _, _, acc = _lda_ref(x0, x1)
    assert out.accuracy == pytest.approx(acc, abs=1e-6)
    assert out.accuracy > 0.95
    # marginal overlap check: a best single-feature split cannot do it
    assert abs(x0[:, 1].mean() - x1[:, 1].mean()) < 2.5


def _kv_df(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "v long")


def test_ind_planted_violations(spark):
    a = _kv_df(spark, [1, 2, 3, 4, 5, 99, 100])
    b = _kv_df(spark, [1, 2, 3, 4, 5, 6, 7])
    out = inclusion_dependency_report(
        [("a_in_b", a, "v", b, "v"), ("b_in_a", b, "v", a, "v")]
    ).collect()
    by = {r.candidate: r for r in out}
    assert by["a_in_b"].distinct_a == 7
    assert by["a_in_b"].violations == 2  # 99, 100
    assert by["a_in_b"].coverage == pytest.approx(5.0 / 7.0, abs=1e-6)
    assert not by["a_in_b"].holds
    assert by["b_in_a"].violations == 2  # 6, 7
    assert not by["b_in_a"].holds


def test_ind_full_containment_and_dupes(spark):
    # duplicates in A must not inflate counts: distinct first
    a = _kv_df(spark, [1, 1, 2, 2, 3])
    b = _kv_df(spark, [1, 2, 3, 4])
    out = inclusion_dependency_report(
        [("a_in_b", a, "v", b, "v")]
    ).collect()[0]
    assert out.distinct_a == 3
    assert out.distinct_b == 4
    assert out.violations == 0
    assert out.holds
    assert out.coverage == pytest.approx(1.0, abs=1e-12)
