"""Wave-102 hand pins: delete-one-group jackknife and the
Horvitz-Thompson total. Jackknife against a plain-Python reference
and the classic closed form (for the mean with singleton groups,
se_jack = sample-sd/sqrt(G) exactly, bias = 0); HT against a hashlib
recomputation of the identical md5 Poisson sample and the exactness
of the stratum multipliers.

Covered spec names: jackknife_aov_se, horvitz_thompson_revenue.
"""

from __future__ import annotations

import hashlib
import math
import statistics
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from mcas_question2_etl_spark.operators.survey import (
    horvitz_thompson_total,
    jackknife_ratio_variance,
)


def _jack_ref(groups):
    # groups: list of (num_sum, den_sum)
    tn = sum(n for n, _ in groups)
    td = sum(d for _, d in groups)
    theta = tn / td
    reps = [(tn - n) / (td - d) for n, d in groups]
    g = len(groups)
    rbar = sum(reps) / g
    var = (g - 1) / g * sum((r - rbar) ** 2 for r in reps)
    bias = (g - 1) * (rbar - theta)
    return theta, bias, math.sqrt(var)


def test_jackknife_matches_reference(spark):
    rows = []
    groups = []
    vals = [(3.0, 2), (10.0, 4), (7.5, 3), (1.0, 1), (20.0, 5), (6.0, 2)]
    for gi, (num, den) in enumerate(vals):
        groups.append((num, den))
        rows.append((gi, Decimal(str(num)), den))
    df = spark.createDataFrame(rows, "grp int, num decimal(18,2), den int")
    out = jackknife_ratio_variance(df, "grp", "num", "den").collect()[0]
    theta, bias, se = _jack_ref(groups)
    assert out.n_groups == 6
    assert out.theta == pytest.approx(theta, abs=1e-6)
    assert out.bias_jack == pytest.approx(bias, abs=1e-6)
    assert out.se_jack == pytest.approx(se, abs=1e-6)


def test_jackknife_mean_closed_form(spark):
    # singleton groups + den = 1: theta is the mean and the jackknife
    # SE collapses to the classic sd/sqrt(G); bias exactly 0
    ys = [4.0, 9.0, 1.0, 16.0, 25.0, 7.0, 12.0, 3.0]
    rows = [(i, Decimal(str(y)), 1) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "grp int, num decimal(18,2), den int")
    out = jackknife_ratio_variance(df, "grp", "num", "den").collect()[0]
    assert out.theta == pytest.approx(statistics.mean(ys), abs=1e-9)
    assert out.bias_jack == pytest.approx(0.0, abs=1e-6)
    assert out.se_jack == pytest.approx(
        statistics.stdev(ys) / math.sqrt(len(ys)), abs=1e-6
    )


def _u(key):
    h = hashlib.md5(f"{key}:ht".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


def _ht_ref(rows, thresh):
    # rows: (id, y)
    n_s = 0
    ht = 0.0
    true = 0.0
    v = 0.0
    for i, y in rows:
        true += y
        pi = 0.5 if y >= thresh else 0.1
        if _u(i) < pi:
            n_s += 1
            ht += y * (2 if pi == 0.5 else 10)
            v += y * y * (2 if pi == 0.5 else 90)
    return n_s, ht, true, math.sqrt(v)


def test_ht_matches_hashlib_reference(spark):
    rows = [(i, float(50 + (i * 37) % 300)) for i in range(1, 400)]
    df = spark.createDataFrame(rows, "oid long, y double")
    out = horvitz_thompson_total(
        df, "oid", "y", F.col("y").cast("decimal(12,2)") >= 200
    ).collect()[0]
    n_s, ht, true, se = _ht_ref(rows, 200.0)
    assert out.n_pop == 399
    assert out.n_sampled == n_s
    assert out.ht_total == pytest.approx(ht, abs=1e-6)
    assert out.true_total == pytest.approx(true, abs=1e-6)
    assert out.se_est == pytest.approx(se, abs=1e-4)


def test_ht_all_big_is_half_sample_unbiased_scaling(spark):
    # every row in the pi=0.5 stratum: HT total = 2 * sampled sum
    rows = [(i, 1000.0) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "oid long, y double")
    out = horvitz_thompson_total(
        df, "oid", "y", F.lit(True)
    ).collect()[0]
    assert out.ht_total == pytest.approx(out.n_sampled * 2000.0, abs=1e-9)
    # md5 uniform: roughly half sampled
    assert 60 <= out.n_sampled <= 140
