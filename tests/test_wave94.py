"""Wave-94 hand pins: Siegel repeated-medians trend and
Goodman-Kruskal lambda. Siegel is recomputed by the definition in
plain Python (nested medians over all pairwise slopes) and pinned on
its robustness property (a corrupted near-half of the points must not
move the slope); lambda against hand-counted contingency tables
including the zero-association and perfect-prediction poles.

Covered spec names: siegel_repeated_medians_daily,
gk_lambda_source_lang.
"""

from __future__ import annotations

import statistics

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.evaluation import gk_lambda
from mcas_question2_etl_spark.operators.regression import (
    siegel_repeated_medians,
)


def _daily_df(spark, pts):
    return spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "day double, y double"
    )


def _siegel_ref(pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    inner = []
    for i in range(len(pts)):
        slopes = [
            (ys[j] - ys[i]) / (xs[j] - xs[i])
            for j in range(len(pts))
            if xs[j] != xs[i]
        ]
        inner.append((xs[i], ys[i], statistics.median(slopes)))
    slope = statistics.median(m for _, _, m in inner)
    icpt = statistics.median(y - slope * x for x, y, _ in inner)
    return slope, icpt


def test_siegel_matches_definition(spark):
    rng = np.random.RandomState(17)
    pts = [(float(i), 3.0 * i + 5.0 + rng.rand()) for i in range(25)]
    out = siegel_repeated_medians(_daily_df(spark, pts), "day", "y").collect()[0]
    slope, icpt = _siegel_ref(pts)
    assert out.n_days == 25
    assert out.slope == pytest.approx(slope, abs=1e-6)
    assert out.intercept == pytest.approx(icpt, abs=1e-6)


def test_siegel_survives_forty_percent_corruption(spark):
    # 25 clean points on y=2x+1; corrupt 10 of them grossly: the
    # repeated-medians slope must stay ~2 (Theil-Sen's 29% breakdown
    # would already be exceeded)
    pts = [(float(i), 2.0 * i + 1.0) for i in range(25)]
    for k in range(10):
        x, _ = pts[k]
        pts[k] = (x, 1000.0 + 50.0 * k)
    out = siegel_repeated_medians(_daily_df(spark, pts), "day", "y").collect()[0]
    slope, icpt = _siegel_ref(pts)
    assert out.slope == pytest.approx(slope, abs=1e-6)
    assert out.slope == pytest.approx(2.0, abs=0.3)


def _cat_df(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_gk_lambda_perfect_prediction(spark):
    # A determines B exactly -> lambda_{B|A} = 1
    rows = [("x", "p")] * 5 + [("y", "q")] * 7 + [("z", "r")] * 3
    out = gk_lambda(_cat_df(spark, rows), "a", "b").collect()[0]
    assert out.n == 15
    assert out.lambda_b_given_a == pytest.approx(1.0, abs=1e-9)
    assert out.lambda_a_given_b == pytest.approx(1.0, abs=1e-9)
    assert out.lambda_symmetric == pytest.approx(1.0, abs=1e-9)


def test_gk_lambda_zero_when_mode_never_changes(spark):
    # B's mode is 'p' within every A level -> knowing A never changes
    # the guess -> lambda_{B|A} = 0 even though the table is associated
    rows = (
        [("x", "p")] * 6
        + [("x", "q")] * 2
        + [("y", "p")] * 5
        + [("y", "q")] * 4
    )
    out = gk_lambda(_cat_df(spark, rows), "a", "b").collect()[0]
    assert out.lambda_b_given_a == pytest.approx(0.0, abs=1e-9)


def test_gk_lambda_matches_hand_count(spark):
    # hand-counted 2x3: rows a1=(10,5,5), a2=(2,8,10)
    rows = (
        [("a1", "b1")] * 10
        + [("a1", "b2")] * 5
        + [("a1", "b3")] * 5
        + [("a2", "b1")] * 2
        + [("a2", "b2")] * 8
        + [("a2", "b3")] * 10
    )
    out = gk_lambda(_cat_df(spark, rows), "a", "b").collect()[0]
    n = 40
    sum_row_max = 10 + 10
    max_b = max(12, 13, 15)  # column marginals
    expect_ba = (sum_row_max - max_b) / (n - max_b)
    sum_col_max = 10 + 8 + 10
    max_a = max(20, 20)
    expect_ab = (sum_col_max - max_a) / (n - max_a)
    expect_sym = (sum_row_max + sum_col_max - max_b - max_a) / (
        2 * n - max_b - max_a
    )
    # operator output is rounded to 6 decimals
    assert out.lambda_b_given_a == pytest.approx(expect_ba, abs=1e-6)
    assert out.lambda_a_given_b == pytest.approx(expect_ab, abs=1e-6)
    assert out.lambda_symmetric == pytest.approx(expect_sym, abs=1e-6)
