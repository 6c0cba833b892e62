"""Wave-43 tests: ABC boundary exactness, contingency residual math,
diversity bucketing, log2 buckets at powers of two, near-dup matrix
labeling."""

from __future__ import annotations

import math


def test_abc_classes_exact_boundaries(spark):
    from mcas_question2_etl_spark.operators.concentration import abc_classes

    # values 50, 30, 15, 5 -> total 100; cum: 50(A), 80(A, == 0.80 cut),
    # 95(B, == 0.95 cut), 100(C)
    rows = [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r.abc_class: r for r in abc_classes(df, "k", "v").collect()}
    assert out["A"].n_keys == 2 and out["B"].n_keys == 1 and out["C"].n_keys == 1
    assert math.isclose(out["A"].value_share, 0.80, rel_tol=1e-12)
    assert math.isclose(out["C"].class_value, 5.0, rel_tol=1e-12)


def test_contingency_residuals_known_table(spark):
    from mcas_question2_etl_spark.operators.evaluation import (
        contingency_residuals,
    )

    # 2x2: [[30, 10], [10, 50]] -> N=100, marginals r=(40,60), c=(40,60)
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 50
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    out = {(o.r, o.c): o for o in contingency_residuals(df, "r", "c").collect()}
    ax = out[("a", "x")]
    assert ax.n_obs == 30 and math.isclose(ax.expected, 16.0, rel_tol=1e-12)
    assert math.isclose(ax.std_residual, 14 / 4.0, rel_tol=1e-12)
    # chi2 = 196/16 + 196/24 + 196/24 + 196/36 = 34.02777...
    assert math.isclose(ax.chi2, 196 / 16 + 196 / 24 + 196 / 24 + 196 / 36,
                        rel_tol=1e-6)
    # 2x2: V = sqrt(chi2/N) = phi
    assert math.isclose(ax.cramers_v, math.sqrt(ax.chi2 / 100), rel_tol=1e-6)


def test_diversity_histogram_uniform_lands_on_k(spark):
    from mcas_question2_etl_spark.operators.entropy import diversity_histogram

    rows = (
        # user 1: uniform over 3 types -> eff exactly 3 -> bucket 3
        [(1, "a"), (1, "b"), (1, "c")]
        # user 2: 3-1 split over 2 types -> 16/10 = 1.6 -> bucket 1
        + [(2, "a")] * 3 + [(2, "b")]
        # user 3: mono -> bucket 1
        + [(3, "a")]
    )
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = {r.diversity_bucket: r.n_keys for r in diversity_histogram(df).collect()}
    assert out == {3: 1, 1: 2}


def test_log2_histogram_power_of_two_edges(spark):
    from mcas_question2_etl_spark.operators.aggregates import log2_histogram

    rows = [("s", 1), ("s", 2), ("s", 3), ("s", 1024), ("s", 1023), ("s", 0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.bucket: r for r in log2_histogram(df, "g", "v").collect()}
    # 1 -> bucket 0; 2,3 -> bucket 1; 1023 -> bucket 9; 1024 -> bucket 10
    assert {b: out[b].n for b in out} == {0: 1, 1: 2, 9: 1, 10: 1}
    assert out[10].lo == 1024 and out[10].min_v == 1024
    assert out[9].max_v == 1023


def test_neardup_source_matrix_labels_pairs(spark):
    from mcas_question2_etl_spark.plans.ops_bi_specs import neardup_source_matrix

    from tests.conftest import SF_SMALL
    out = neardup_source_matrix(spark, SF_SMALL).collect()
    # normalized pair labels: source_a <= source_b always
    for r in out:
        assert r.source_a <= r.source_b
        assert r.n_pairs >= 1
