"""Wave-111 hand pins: two-sample Cramér-von Mises and BWS. Both
against plain-Python rank references (Anderson's U form; the BWS
weighted integral), the identical-samples null pole, a planted
location shift both must flag, and the tie-pairing determinism the
dedup-expand rank stage exists for.

Covered spec names: cvm_two_sample_priority,
bws_two_sample_priority.
"""

from __future__ import annotations

import pytest
import numpy as np

from mcas_question2_etl_spark.operators.evaluation import (
    bws_test,
    cramer_von_mises_2s,
)


def _df(spark, xs, ys):
    rows = [("a", float(v)) for v in xs] + [("b", float(v)) for v in ys]
    return spark.createDataFrame(rows, "g string, v double")


def _ranks(xs, ys):
    # the dedup-expand convention: sort by (value, group with a<b),
    # k-th tied combined rank pairs with k-th within rank
    tagged = sorted(
        [(v, 0, i) for i, v in enumerate(xs)]
        + [(v, 1, i) for i, v in enumerate(ys)],
        key=lambda t: (t[0], t[1]),
    )
    r_of = {}
    within = {0: 0, 1: 0}
    for r, (v, g, i) in enumerate(tagged, start=1):
        within[g] += 1
        r_of[(g, v, within[g])] = (r, within[g])
    # rebuild per-group (r, i) lists in within order
    ra = [r_of[(0, v, k)] for k, v in enumerate(sorted(xs), start=1)]
    rb = [r_of[(1, v, k)] for k, v in enumerate(sorted(ys), start=1)]
    return ra, rb


def _cvm_ref(xs, ys):
    ra, rb = _ranks(xs, ys)
    n, m = len(xs), len(ys)
    u = n * sum((r - i) ** 2 for r, i in ra) + m * sum(
        (r - i) ** 2 for r, i in rb
    )
    t = u / (n * m * (n + m)) - (4 * n * m - 1) / (6 * (n + m))
    return u, t


def _bws_ref(xs, ys):
    ra, rb = _ranks(xs, ys)
    n, m = len(xs), len(ys)
    bx = sum(
        (r - (m + n) / n * i) ** 2
        / ((i / (n + 1)) * (1 - i / (n + 1)) * (m * (m + n) / n))
        for r, i in ra
    ) / n
    by = sum(
        (r - (m + n) / m * i) ** 2
        / ((i / (m + 1)) * (1 - i / (m + 1)) * (n * (m + n) / m))
        for r, i in rb
    ) / m
    return bx, by, (bx + by) / 2


def test_cvm_matches_reference_with_ties(spark):
    rng = np.random.RandomState(11)
    xs = rng.randint(0, 30, size=70).astype(float).tolist()
    ys = rng.randint(5, 35, size=55).astype(float).tolist()
    out = cramer_von_mises_2s(_df(spark, xs, ys), "g", "v", "a", "b").collect()[0]
    u, t = _cvm_ref(xs, ys)
    assert out.n_a == 70
    assert out.n_b == 55
    assert out.u_stat == u
    assert out.cvm_t == pytest.approx(t, abs=1e-6)


def test_cvm_shift_detected_null_small(spark):
    rng = np.random.RandomState(3)
    base = np.round(rng.randn(200), 2)
    same = cramer_von_mises_2s(
        _df(spark, base[:100], base[100:]), "g", "v", "a", "b"
    ).collect()[0]
    shifted = cramer_von_mises_2s(
        _df(spark, base[:100], base[100:] + 1.5), "g", "v", "a", "b"
    ).collect()[0]
    assert same.cvm_t < 0.461  # 5% critical value
    assert shifted.cvm_t > 0.743  # 1% critical value


def test_bws_matches_reference(spark):
    rng = np.random.RandomState(17)
    xs = np.round(rng.randn(60), 2).tolist()
    ys = np.round(rng.randn(50) * 2.5, 2).tolist()  # scale diff: tails
    out = bws_test(_df(spark, xs, ys), "g", "v", "a", "b").collect()[0]
    bx, by, b = _bws_ref(xs, ys)
    assert out.b_x == pytest.approx(bx, abs=1e-6)
    assert out.b_y == pytest.approx(by, abs=1e-6)
    assert out.bws_b == pytest.approx(b, abs=1e-6)
    assert out.bws_b > 2.49  # tail-weighting flags the scale change


def test_bws_null_small(spark):
    rng = np.random.RandomState(25)
    xs = np.round(rng.randn(120), 2).tolist()
    ys = np.round(rng.randn(110), 2).tolist()
    out = bws_test(_df(spark, xs, ys), "g", "v", "a", "b").collect()[0]
    assert out.bws_b == pytest.approx(_bws_ref(xs, ys)[2], abs=1e-6)
    assert out.bws_b < 2.49


def test_tie_pairing_deterministic(spark):
    # heavy exact duplicates across and within groups: repeated runs
    # must agree (the pre-fix ROW_NUMBER pairing was shuffle-luck)
    xs = [5.0] * 20 + [7.0] * 10
    ys = [5.0] * 15 + [9.0] * 15
    vals = [
        cramer_von_mises_2s(
            _df(spark, xs, ys), "g", "v", "a", "b"
        ).collect()[0].u_stat
        for _ in range(3)
    ]
    assert len(set(vals)) == 1
    u, t = _cvm_ref(xs, ys)
    assert vals[0] == u
