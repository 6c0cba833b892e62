"""Wave-114 hand pins: Kendall's tau-b and Stuart's tau-c on the
contingency grid. Against a plain-Python pair-counting reference on
tied ordinal data, the perfect-monotone pole where tau-c reaches 1
on a non-square table while tau-b cannot, and the independence zero.

Covered spec names: ordinal_tau_qty_discount.
"""

from __future__ import annotations

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.evaluation import ordinal_tau


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "x long, y long"
    )


def _ref(pairs):
    n = len(pairs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[j][0] - pairs[i][0]
            dy = pairs[j][1] - pairs[i][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = n * (n - 1) / 2
    from collections import Counter

    tx = sum(v * (v - 1) // 2 for v in Counter(p[0] for p in pairs).values())
    ty = sum(v * (v - 1) // 2 for v in Counter(p[1] for p in pairs).values())
    rx = len({p[0] for p in pairs})
    ry = len({p[1] for p in pairs})
    m = min(rx, ry)
    tau_b = (c - d) / ((n0 - tx) * (n0 - ty)) ** 0.5
    tau_c = 2 * m * (c - d) / (n * n * (m - 1))
    return c, d, tau_b, tau_c


def test_matches_reference_with_ties(spark):
    rng = np.random.RandomState(11)
    pairs = [
        (rng.randint(0, 5), rng.randint(0, 4)) for _ in range(120)
    ]
    out = ordinal_tau(_df(spark, pairs), "x", "y").collect()[0]
    c, d, tb, tc = _ref(pairs)
    assert out.n == 120
    assert out.conc == c
    assert out.disc == d
    assert out.tau_b == pytest.approx(tb, abs=1e-6)
    assert out.tau_c == pytest.approx(tc, abs=1e-6)


def test_perfect_monotone_nonsquare_table(spark):
    # x has 4 levels, y has 2, perfectly monotone by construction:
    # tau-c reaches exactly 1 (its whole reason to exist), tau-b
    # cannot on an off-square table
    pairs = (
        [(0, 0)] * 10 + [(1, 0)] * 10 + [(2, 1)] * 10 + [(3, 1)] * 10
    )
    out = ordinal_tau(_df(spark, pairs), "x", "y").collect()[0]
    c, d, tb, tc = _ref(pairs)
    assert out.tau_c == pytest.approx(tc, abs=1e-9)
    assert out.tau_c == pytest.approx(1.0, abs=1e-9)
    assert out.tau_b == pytest.approx(tb, abs=1e-6)
    assert out.tau_b < 1.0


def test_independent_near_zero(spark):
    pairs = [(i % 4, (i // 4) % 3) for i in range(240)]
    out = ordinal_tau(_df(spark, pairs), "x", "y").collect()[0]
    c, d, tb, tc = _ref(pairs)
    assert out.conc == c and out.disc == d
    assert out.tau_b == pytest.approx(tb, abs=1e-6)
    assert abs(out.tau_b) < 0.05
    assert abs(out.tau_c) < 0.05
