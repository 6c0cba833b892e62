"""Wave-91 hand pins: support-function convex hull and newsvendor
stocking quantiles. The hull is cross-checked against a brute-force
exact convex hull (monotone chain in plain Python) on fixtures where
the support polygon is exact (points whose hull vertices are all
extreme in some pinned direction — squares, regular polygons), plus
the inscription bound on a random cloud. The newsvendor levels are
recomputed with numpy interpolated quantiles.

Covered spec names: support_hull_nations, newsvendor_stock_levels.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.spatial import (
    SUPPORT_HULL_K,
    support_hull,
)


def _pts_df(spark, groups):
    rows = []
    for g, pts in groups.items():
        for i, (x, y) in enumerate(pts):
            rows.append((g, i, float(x), float(y)))
    return spark.createDataFrame(rows, "g int, pid long, x double, y double")


def _shoelace(poly):
    s = 0.0
    for (x1, y1), (x2, y2) in zip(poly, poly[1:] + poly[:1]):
        s += x1 * y2 - x2 * y1
    return abs(s) / 2.0


def _hull_exact(points):
    """Monotone chain, plain Python."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def half(pp):
        out = []
        for p in pp:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(list(reversed(pts)))
    return lower[:-1] + upper[:-1]


def test_support_hull_exact_on_square(spark):
    # axis-aligned square: every vertex is extreme in some of the 12
    # pinned directions -> the support polygon IS the hull
    square = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 3)]
    out = support_hull(
        _pts_df(spark, {1: square}), "g", "pid", "x", "y"
    ).collect()[0]
    assert out.hull_area == pytest.approx(16.0, abs=1e-9)
    assert out.n_support_points == 4


def test_support_hull_exact_on_regular_12gon(spark):
    # a regular 12-gon aligned with the pinned directions: exact
    poly = [
        (math.cos(2 * math.pi * i / 12), math.sin(2 * math.pi * i / 12))
        for i in range(12)
    ]
    out = support_hull(
        _pts_df(spark, {1: poly}), "g", "pid", "x", "y"
    ).collect()[0]
    exact = _shoelace(poly)
    assert out.n_support_points == 12
    assert out.hull_area == pytest.approx(exact, abs=1e-9)


def test_support_hull_inscribes_true_hull(spark):
    rng = np.random.RandomState(3)
    cloud = [(float(x), float(y)) for x, y in rng.rand(80, 2) * 10]
    out = support_hull(
        _pts_df(spark, {1: cloud}), "g", "pid", "x", "y"
    ).collect()[0]
    true_area = _shoelace(_hull_exact(cloud))
    assert out.hull_area <= true_area + 1e-9
    # 12 directions capture most of a convex blob's area
    assert out.hull_area >= 0.8 * true_area
    assert 3 <= out.n_support_points <= SUPPORT_HULL_K


def test_support_hull_multiple_groups_and_ties(spark):
    groups = {
        1: [(0, 0), (1, 0), (1, 1), (0, 1)],
        2: [(5, 5), (5, 5), (5, 5)],  # degenerate: single site
    }
    out = {
        r.g: r
        for r in support_hull(
            _pts_df(spark, groups), "g", "pid", "x", "y"
        ).collect()
    }
    assert out[1].hull_area == pytest.approx(1.0, abs=1e-9)
    # all directions pick the same (tie -> min pid) point; zero area
    assert out[2].n_support_points == 1
    assert out[2].hull_area == 0.0


def test_newsvendor_quantiles_match_numpy(spark):
    rows = []
    rng = np.random.RandomState(7)
    for brand in ("A", "B"):
        base = 100 if brand == "A" else 300
        for week, d in enumerate(rng.randint(base, base + 50, size=30)):
            rows.append((brand, week, float(d)))
    df = spark.createDataFrame(rows, "p_brand string, week long, demand double")
    from pyspark.sql import functions as F

    out = {
        r.p_brand: r
        for r in df.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_weeks"),
            F.expr("percentile(demand, 0.5)").alias("stock_cf50"),
            F.expr("percentile(demand, 0.75)").alias("stock_cf75"),
            F.expr("percentile(demand, 0.9)").alias("stock_cf90"),
        )
        .collect()
    }
    for brand in ("A", "B"):
        dem = [d for b, _, d in rows if b == brand]
        assert out[brand].n_weeks == 30
        for col, q in [
            ("stock_cf50", 50),
            ("stock_cf75", 75),
            ("stock_cf90", 90),
        ]:
            assert getattr(out[brand], col) == pytest.approx(
                float(np.percentile(dem, q)), abs=1e-9
            )
    # the critical-fractile levels are monotone in the service target
    for brand in ("A", "B"):
        r = out[brand]
        assert r.stock_cf50 <= r.stock_cf75 <= r.stock_cf90
