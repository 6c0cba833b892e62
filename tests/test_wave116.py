"""Wave-116 hand pins: Zipf-Mandelbrot fit and second-digit Benford.
The fit recovers a planted (q*, alpha) law exactly (R^2 -> 1) and
matches a numpy per-q OLS reference; Benford-2 pins the digit
extraction, the Newcomb-Benford second-digit probabilities (sum to
1, decreasing in d), log-uniform conformance, and a planted
threshold-padding manipulation the first-digit test cannot see.

Covered spec names: zipf_mandelbrot_fit, benford_second_digit_prices.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.benford import benford_second_digit
from mcas_question2_etl_spark.operators.text import zipf_mandelbrot_fit

_GRID = (0, 1, 2, 3, 4, 5, 6, 8, 10, 15, 20)


def _docs_from_counts(spark, counts):
    # one document repeating each synthetic token cnt times
    text = " ".join(
        " ".join([f"tok{i:03d}"] * c) for i, c in enumerate(counts)
    )
    return spark.createDataFrame([(text,)], "text string")


def _fit_ref(counts, q):
    r = np.arange(1, len(counts) + 1, dtype=float)
    lx = np.log(r + q)
    ly = np.log(np.asarray(counts, dtype=float))
    lxc = lx - lx.mean()
    lyc = ly - ly.mean()
    alpha = -(lxc * lyc).sum() / (lxc * lxc).sum()
    r2 = (lxc * lyc).sum() ** 2 / ((lxc * lxc).sum() * (lyc * lyc).sum())
    return alpha, r2


def test_recovers_planted_mandelbrot_law(spark):
    q_true, a_true = 5, 1.2
    counts = [
        max(1, round(100000.0 / (r + q_true) ** a_true))
        for r in range(1, 61)
    ]
    # counts must be rank-sorted descending for the rank stage
    assert counts == sorted(counts, reverse=True)
    out = zipf_mandelbrot_fit(
        _docs_from_counts(spark, counts), top_k=60
    ).collect()[0]
    assert out.q_best == q_true
    assert out.alpha == pytest.approx(a_true, abs=0.02)
    assert out.r2 > 0.9999
    a0, r20 = _fit_ref(counts, 0)
    assert out.alpha_zipf == pytest.approx(a0, abs=1e-5)
    assert out.r2_zipf == pytest.approx(r20, abs=1e-5)
    assert out.r2 > out.r2_zipf  # the offset earns its keep


def test_plain_zipf_picks_q_zero(spark):
    counts = [max(1, round(50000.0 / r**1.05)) for r in range(1, 51)]
    out = zipf_mandelbrot_fit(
        _docs_from_counts(spark, counts), top_k=50
    ).collect()[0]
    assert out.q_best == 0
    assert out.r2 == pytest.approx(out.r2_zipf, abs=1e-9)


def _money_df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "amt double")


def _p2(d):
    return sum(math.log10(1 + 1.0 / (10 * k + d)) for k in range(1, 10))


def test_benford2_probabilities_and_extraction(spark):
    # 1234 -> second digit 2; 905 -> 0; values < 10 excluded
    out = benford_second_digit(
        _money_df(spark, [1234.0, 905.0, 9.99, 25.5, 10.0]), "amt"
    ).collect()
    by = {r.digit: r for r in out}
    assert by[2].n_obs == 1  # 1234
    assert by[0].n_obs == 2  # 905, 10
    assert by[5].n_obs == 1  # 25.5
    assert 9.99 not in [None]  # excluded by the >= 10 gate: 4 rows total
    assert sum(r.n_obs for r in out) == 4
    for r in out:
        assert r.p_benford2 == pytest.approx(_p2(r.digit), abs=1e-12)
    # the full second-digit law sums to 1 and decreases in d
    probs = [_p2(d) for d in range(10)]
    assert sum(probs) == pytest.approx(1.0, abs=1e-12)
    assert all(probs[i] > probs[i + 1] for i in range(9))


def test_benford2_log_uniform_conforms_padding_flagged(spark):
    rng = np.random.RandomState(7)
    conforming = (10.0 ** rng.uniform(1, 5, size=20000)).tolist()
    chi_ok = sum(
        r.chi_term
        for r in benford_second_digit(
            _money_df(spark, conforming), "amt"
        ).collect()
    )
    # threshold padding: amounts pushed just under round numbers --
    # second digit 9 everywhere, first digits untouched
    padded = [float(f"{d}9{rng.randint(10, 99)}") for d in
              rng.randint(1, 10, size=2000)]
    chi_bad = sum(
        r.chi_term
        for r in benford_second_digit(
            _money_df(spark, padded), "amt"
        ).collect()
    )
    assert chi_ok < 30.0  # chi2(9) 1% ~ 21.7; conforming stays low-ish
    assert chi_bad > 1000.0
