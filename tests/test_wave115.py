"""Wave-115 hand pins: Welch's heteroskedastic ANOVA (+ Brown-
Forsythe F*) and the Rousseeuw-Croux Qn scale. Welch against a
plain-Python reference, collapsing to the classical F under equal
variances and diverging from it in the unbalanced-heteroskedastic
case it exists for; Qn against a brute-force pairwise reference,
Gaussian consistency (Qn ~ sigma), and the 30%-contamination
robustness SD fails.

Covered spec names: welch_anova_priority_price, qn_scale_daily.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.evaluation import welch_anova
from mcas_question2_etl_spark.operators.timeseries import qn_scale


def _gdf(spark, groups):
    rows = [
        (f"g{gi}", float(v)) for gi, vals in enumerate(groups) for v in vals
    ]
    return spark.createDataFrame(rows, "g string, v double")


def _welch_ref(groups):
    ms = [np.mean(g) for g in groups]
    s2 = [np.var(g, ddof=1) for g in groups]
    ns = [len(g) for g in groups]
    k = len(groups)
    w = [n / v for n, v in zip(ns, s2)]
    sw = sum(w)
    xw = sum(wi * mi for wi, mi in zip(w, ms)) / sw
    between = sum(wi * (mi - xw) ** 2 for wi, mi in zip(w, ms)) / (k - 1)
    lam = sum(
        (1 - wi / sw) ** 2 / (ni - 1) for wi, ni in zip(w, ns)
    )
    f = between / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3 * lam)
    n = sum(ns)
    xbar = sum(ni * mi for ni, mi in zip(ns, ms)) / n
    bf = sum(ni * (mi - xbar) ** 2 for ni, mi in zip(ns, ms)) / sum(
        (1 - ni / n) * vi for ni, vi in zip(ns, s2)
    )
    return f, df2, bf


def test_welch_matches_reference(spark):
    rng = np.random.RandomState(5)
    groups = [
        np.round(100 + 3 * rng.randn(40), 2).tolist(),
        np.round(104 + 9 * rng.randn(25), 2).tolist(),
        np.round(98 + 1.5 * rng.randn(60), 2).tolist(),
    ]
    out = welch_anova(_gdf(spark, groups), "g", "v").collect()[0]
    f, df2, bf = _welch_ref(groups)
    assert out.k == 3
    assert out.n == 125
    assert out.welch_f == pytest.approx(f, abs=1e-5)
    assert out.welch_df2 == pytest.approx(df2, abs=1e-4)
    assert out.bf_f == pytest.approx(bf, abs=1e-5)


def test_welch_collapses_under_equal_variance(spark):
    rng = np.random.RandomState(9)
    groups = [
        np.round(50 + 2 * rng.randn(80), 2).tolist() for _ in range(4)
    ]
    out = welch_anova(_gdf(spark, groups), "g", "v").collect()[0]
    # classical one-way F for comparison
    allv = [v for g in groups for v in g]
    gm = np.mean(allv)
    msb = sum(len(g) * (np.mean(g) - gm) ** 2 for g in groups) / 3
    msw = sum(
        (len(g) - 1) * np.var(g, ddof=1) for g in groups
    ) / (len(allv) - 4)
    f_classic = msb / msw
    assert out.welch_f == pytest.approx(f_classic, rel=0.05)
    assert out.bf_f == pytest.approx(f_classic, rel=0.05)


def _ddf(spark, ys):
    return spark.createDataFrame(
        [(i, float(y)) for i, y in enumerate(ys)], "day int, y double"
    )


def _qn_ref(ys):
    y = sorted(float(v) for v in ys)
    n = len(y)
    ds = sorted(
        abs(y[i] - y[j]) for i in range(n) for j in range(i + 1, n)
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    return 2.2219 * ds[k - 1], k


def test_qn_matches_reference(spark):
    rng = np.random.RandomState(13)
    ys = (20 + 4 * rng.randn(120)).tolist()
    out = qn_scale(_ddf(spark, ys)).collect()[0]
    qn, k = _qn_ref(ys)
    assert out.n == 120
    assert out.k == k
    assert out.qn == pytest.approx(qn, abs=1e-6)


def test_qn_gaussian_consistency(spark):
    rng = np.random.RandomState(3)
    ys = (7.0 * rng.randn(600)).tolist()
    out = qn_scale(_ddf(spark, ys)).collect()[0]
    assert out.qn == pytest.approx(7.0, rel=0.12)
    assert out.sd == pytest.approx(7.0, rel=0.12)


def test_qn_survives_thirty_pct_contamination(spark):
    rng = np.random.RandomState(21)
    clean = 10 + 1.0 * rng.randn(140)
    ys = clean.tolist()
    for i in range(42):  # 30% gross outliers
        ys[i] = 500.0 + 50.0 * i
    out = qn_scale(_ddf(spark, ys)).collect()[0]
    qn, _ = _qn_ref(ys)
    assert out.qn == pytest.approx(qn, abs=1e-6)
    assert out.qn < 5.0  # still reads the clean core's scale
    assert out.sd > 100.0  # classical SD is destroyed
