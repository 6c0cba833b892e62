"""Wave-96 hand pins: Fleiss' kappa and Krippendorff's alpha
(nominal). Fleiss against the classic Fleiss (1971) / Wikipedia
14-rater x 10-item x 5-category worked example (kappa = 0.210) and a
plain-Python definition reference; alpha against a definition
reference on data WITH missing ratings, plus the perfect-agreement
and two-rater-reduction poles.

Covered spec names: fleiss_kappa_gates, krippendorff_alpha_gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.evaluation import (
    fleiss_kappa,
    krippendorff_alpha_nominal,
)

# the Fleiss (1971) psychiatric-diagnosis table: rows = 10 subjects,
# columns = counts of the 14 raters choosing each of 5 categories
_FLEISS_TABLE = [
    [0, 0, 0, 0, 14],
    [0, 2, 6, 4, 2],
    [0, 0, 3, 5, 6],
    [0, 3, 9, 2, 0],
    [2, 2, 8, 1, 1],
    [7, 7, 0, 0, 0],
    [3, 2, 6, 3, 0],
    [2, 5, 3, 2, 2],
    [6, 5, 2, 1, 0],
    [0, 2, 2, 3, 7],
]


def _ratings_rows(table):
    # expand a counts table into per-item rater columns (rater order
    # within an item does not affect kappa/alpha)
    rows = []
    for i, counts in enumerate(table):
        verdicts = []
        for cat, c in enumerate(counts):
            verdicts.extend([str(cat)] * c)
        rows.append((i, *verdicts))
    return rows


def _fleiss_ref(table):
    n = len(table)
    m = sum(table[0])
    k = len(table[0])
    p_i = [
        (sum(c * c for c in row) - m) / (m * (m - 1)) for row in table
    ]
    p_bar = sum(p_i) / n
    p_j = [sum(row[j] for row in table) / (n * m) for j in range(k)]
    p_e = sum(p * p for p in p_j)
    return p_bar, p_e, (p_bar - p_e) / (1.0 - p_e)


def _alpha_ref(units):
    # units: list of lists of verdicts (None = missing)
    incl = [
        [v for v in u if v is not None]
        for u in units
    ]
    incl = [u for u in incl if len(u) >= 2]
    cats = sorted({v for u in incl for v in u})
    n = sum(len(u) for u in incl)
    d_num = 0.0
    for u in incl:
        m = len(u)
        s2 = sum(u.count(c) ** 2 for c in cats)
        d_num += (m * m - s2) / (m - 1)
    nc2 = sum(sum(u.count(c) for u in incl) ** 2 for c in cats)
    return 1.0 - (n - 1) * d_num / (n * n - nc2)


def test_fleiss_classic_example(spark):
    rows = _ratings_rows(_FLEISS_TABLE)
    cols = ["item"] + [f"r{j}" for j in range(14)]
    df = spark.createDataFrame(rows, cols)
    out = fleiss_kappa(
        df, "item", [F.col(f"r{j}") for j in range(14)]
    ).collect()[0]
    p_bar, p_e, kappa = _fleiss_ref(_FLEISS_TABLE)
    assert out.n_items == 10
    assert out.n_raters == 14
    assert out.p_bar == pytest.approx(p_bar, abs=1e-6)
    assert out.p_e == pytest.approx(p_e, abs=1e-6)
    assert out.kappa == pytest.approx(kappa, abs=1e-6)
    # the published value for this table
    assert out.kappa == pytest.approx(0.210, abs=0.001)


def test_fleiss_perfect_agreement(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(20)], "item int, v string"
    )
    out = fleiss_kappa(
        df, "item", [F.col("v"), F.col("v"), F.col("v")]
    ).collect()[0]
    assert out.kappa == pytest.approx(1.0, abs=1e-9)


def test_alpha_matches_definition_with_missing(spark):
    units = [
        ["a", "a", None],
        ["a", "b", "b"],
        ["b", "b", "b"],
        ["a", None, "a"],
        ["b", "a", None],
        ["a", "a", "a"],
        ["b", "b", "a"],
        [None, "b", "b"],
    ]
    rows = [(i, u[0], u[1], u[2]) for i, u in enumerate(units)]
    df = spark.createDataFrame(
        rows, "item int, r0 string, r1 string, r2 string"
    )
    out = krippendorff_alpha_nominal(
        df, "item", [F.col("r0"), F.col("r1"), F.col("r2")]
    ).collect()[0]
    assert out.n_items == 8
    assert out.n_ratings == sum(
        sum(1 for v in u if v is not None) for u in units
    )
    assert out.alpha == pytest.approx(_alpha_ref(units), abs=1e-6)


def test_alpha_single_rating_items_excluded(spark):
    # an item with only one non-null verdict carries no pairable
    # information and must be dropped, not crash or skew
    units = [
        ["a", "a", "a"],
        ["b", None, None],  # m_i = 1 -> excluded
        ["a", "b", None],
    ]
    rows = [(i, u[0], u[1], u[2]) for i, u in enumerate(units)]
    df = spark.createDataFrame(
        rows, "item int, r0 string, r1 string, r2 string"
    )
    out = krippendorff_alpha_nominal(
        df, "item", [F.col("r0"), F.col("r1"), F.col("r2")]
    ).collect()[0]
    assert out.n_items == 2
    assert out.n_ratings == 5
    assert out.alpha == pytest.approx(_alpha_ref(units), abs=1e-6)


def test_alpha_perfect_agreement_is_one(spark):
    df = spark.createDataFrame(
        [(i, "x" if i < 7 else "y") for i in range(15)],
        "item int, v string",
    )
    out = krippendorff_alpha_nominal(
        df, "item", [F.col("v"), F.col("v"), F.col("v")]
    ).collect()[0]
    assert out.alpha == pytest.approx(1.0, abs=1e-9)
