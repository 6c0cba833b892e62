"""Wave-35 tests: Theil-Sen robustness pin, cross-correlation
identity checks."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F


def test_theil_sen_matches_python_and_resists_outlier(spark):
    from mcas_question2_etl_spark.plans.timeseries_specs import theil_sen_daily_trend
    from mcas_question2_etl_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    got = {r.event_type: r for r in theil_sen_daily_trend(spark, SF_SMALL).collect()}
    events = load_table(spark, SF_SMALL, "events")
    daily = (
        events.groupBy(
            "event_type",
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.c))
    for et, pts in series.items():
        pts.sort()
        slopes = sorted(
            (c2 - c1) / (d2 - d1)
            for i, (d1, c1) in enumerate(pts)
            for (d2, c2) in pts[i + 1 :]
        )
        # low median (index-picked, no interpolation)
        want = slopes[(len(slopes) + 1) // 2 - 1]
        assert got[et].n_pairs == len(slopes)
        assert got[et].median_slope == pytest.approx(want)


def test_lagged_corr_bounds_and_lag0_is_pearson(spark):
    from mcas_question2_etl_spark.plans.timeseries_specs import (
        _LAGS,
        lagged_cross_correlation,
    )
    from mcas_question2_etl_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    rows = {r.lag: r for r in lagged_cross_correlation(spark, SF_SMALL).collect()}
    assert set(rows) == set(_LAGS)
    for r in rows.values():
        assert -1 - 1e-9 <= r.corr <= 1 + 1e-9
        assert r.n_days > 0
    # lag 0 equals statistics.correlation on the aligned series
    events = load_table(spark, SF_SMALL, "events")
    daily = (
        events.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(
            "event_type",
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    per = {}
    for r in daily:
        per.setdefault(r.day, {})[r.event_type] = r.c
    xs, ys = zip(
        *[(v["view"], v["purchase"]) for v in per.values() if len(v) == 2]
    )
    assert rows[0].corr == pytest.approx(
        statistics.correlation(xs, ys), rel=1e-9
    )
