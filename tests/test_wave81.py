"""Wave-81 hand pins: D'Agostino K², Bartlett, Kuiper, tokenizer
fertility, Heaps-law fit — expected values recomputed independently
in-test (full transform chains in pure python).

Covered spec names: dagostino_k2_doclen, bartlett_priority_price,
kuiper_dow_events, tokenizer_fertility_report, heaps_law_fit.
"""

from __future__ import annotations

import math
import re

import pytest

from mcas_question2_etl_spark.operators import evaluation, text


def test_dagostino_k2_pin(spark):
    """Right-skewed integer sample; Z1/Z2/K² recomputed through the
    Johnson SU and Anscombe-Glynn chains."""
    xs = [1, 1, 2, 2, 2, 3, 3, 4, 5, 8, 9, 15, 2, 3, 1, 2, 4, 3, 2, 6]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum(x * x for x in xs) / n - mu * mu
    m3 = (
        sum(x**3 for x in xs) / n
        - 3 * mu * (sum(x * x for x in xs) / n)
        + 2 * mu**3
    )
    m4 = (
        sum(x**4 for x in xs) / n
        - 4 * mu * (sum(x**3 for x in xs) / n)
        + 6 * mu * mu * (sum(x * x for x in xs) / n)
        - 3 * mu**4
    )
    b1 = m3 / (m2 * math.sqrt(m2))
    b2 = m4 / (m2 * m2)
    y = b1 * math.sqrt(((n + 1) * (n + 3)) / (6 * (n - 2)))
    beta2 = (
        3
        * (n * n + 27 * n - 70)
        * (n + 1)
        * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = -1 + math.sqrt(2 * (beta2 - 1))
    delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    alpha = math.sqrt(2 / (w2 - 1))
    z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1))
    eb2 = 3 * (n - 1) / (n + 1)
    vb2 = 24 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    xx = (b2 - eb2) / math.sqrt(vb2)
    sb1 = (6 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))) * math.sqrt(
        6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))
    )
    a = 6 + (8 / sb1) * (2 / sb1 + math.sqrt(1 + 4 / sb1**2))
    z2 = (
        (1 - 2 / (9 * a))
        - ((1 - 2 / a) / (1 + xx * math.sqrt(2 / (a - 4)))) ** (1 / 3)
    ) / math.sqrt(2 / (9 * a))
    df = spark.createDataFrame([(int(v),) for v in xs], "doclen long")
    r = evaluation.dagostino_k2(df, "doclen").collect()[0]
    assert r.n == n
    assert r.skew_z == pytest.approx(round(z1, 6), abs=1e-9)
    assert r.kurt_z == pytest.approx(round(z2, 6), abs=1e-9)
    assert r.k2_stat == pytest.approx(round(z1 * z1 + z2 * z2, 6), abs=1e-9)
    assert r.skew_z > 2  # the skew is blatant


def test_bartlett_pin(spark):
    """Three groups with visibly different spreads; T/C recomputed."""
    groups = {
        "a": [10.0, 11.0, 9.0, 10.5, 9.5],
        "b": [10.0, 14.0, 6.0, 13.0, 7.0],
        "c": [10.0, 20.0, 0.5, 18.0, 2.0],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = evaluation.bartlett_test(df, "g", "v").collect()[0]
    k = len(groups)
    nn = sum(len(v) for v in groups.values())
    ssws, nlnvs, invs = 0.0, 0.0, 0.0
    for vs in groups.values():
        ni = len(vs)
        s, s2 = sum(vs), sum(v * v for v in vs)
        ssw = s2 - s * s / ni
        ssws += ssw
        nlnvs += (ni - 1) * math.log(ssw / (ni - 1))
        invs += 1 / (ni - 1)
    sp2 = ssws / (nn - k)
    t = (nn - k) * math.log(sp2) - nlnvs
    c = 1 + (invs - 1 / (nn - k)) / (3 * (k - 1))
    assert (r.k, r.n) == (k, nn)
    assert r.pooled_sd == pytest.approx(round(math.sqrt(sp2), 6), abs=1e-9)
    assert r.bartlett_stat == pytest.approx(round(t / c, 6), abs=1e-9)
    assert r.bartlett_stat > 5  # heteroscedastic on purpose


def test_kuiper_pin(spark):
    """Weekend bulge straddling the cycle cut: V recomputed from the
    7-cell cumulative proportions."""
    counts = {0: 30, 1: 10, 2: 10, 3: 10, 4: 10, 5: 10, 6: 30}
    rows = [(c,) for c, n in counts.items() for _ in range(n)]
    df = spark.createDataFrame(rows, "dow int")
    r = evaluation.kuiper_uniformity(df, "dow", 7).collect()[0]
    n = sum(counts.values())
    cum, dp, dm = 0, 0.0, 0.0
    for i in range(7):
        cum += counts[i]
        f, e = cum / n, (i + 1) / 7
        dp, dm = max(dp, f - e), max(dm, e - f)
    v = dp + dm
    vm = v * (math.sqrt(n) + 0.155 + 0.24 / math.sqrt(n))
    assert (r.n, r.n_cells) == (n, 7)
    assert r.d_plus == pytest.approx(round(dp, 6), abs=1e-9)
    assert r.d_minus == pytest.approx(round(dm, 6), abs=1e-9)
    assert r.v_stat == pytest.approx(round(v, 6), abs=1e-9)
    assert r.v_mod == pytest.approx(round(vm, 6), abs=1e-9)
    assert r.d_plus > 0 and r.d_minus > 0  # both tails active


def test_tokenizer_fertility_pin(spark):
    """Counts recomputed with the same regexes."""
    t1 = "don't split-me up 123abc"
    t2 = "plain words only"
    df = spark.createDataFrame(
        [("en", "web", t1), ("en", "web", t2)],
        "lang string, source string, text string",
    )
    r = text.tokenizer_fertility_report(df).collect()[0]
    bpe = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")
    wd = len(re.findall(r"\S+", t1)) + len(re.findall(r"\S+", t2))
    tk = len(bpe.findall(t1)) + len(bpe.findall(t2))
    ch = len(t1) + len(t2)
    assert (r.n_docs, r.words, r.bpe_tokens, r.chars) == (2, wd, tk, ch)
    assert r.fertility == pytest.approx(round(tk / wd, 9), abs=1e-12)
    assert r.chars_per_token == pytest.approx(round(ch / tk, 9), abs=1e-12)
    assert r.fertility > 1  # punctuation splits guarantee it


def test_heaps_law_fit_pin(spark):
    """10 docs, vocab recycling by construction: alpha recomputed
    from the exact cumulative points."""
    docs = [(i, " ".join(f"w{j}" for j in range(0, 2 + i))) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = text.heaps_law_fit(df).collect()[0]
    # python twin: bucket i holds exactly doc i (ids 0..9, 10 buckets)
    seen, pts = set(), []
    tn = 0
    for i, t in docs:
        toks = t.lower().split()
        tn += len(toks)
        seen |= set(toks)
        pts.append((math.log(tn), math.log(len(seen))))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts) - sx * sx / n
    syy = sum(y * y for _, y in pts) - sy * sy / n
    sxy = sum(x * y for x, y in pts) - sx * sy / n
    alpha = sxy / sxx
    kc = math.exp(sy / n - alpha * (sx / n))
    r2 = sxy * sxy / (sxx * syy)
    assert r.n_points == n
    assert r.alpha == pytest.approx(round(alpha, 9), abs=1e-9)
    assert r.k_coef == pytest.approx(round(kc, 9), abs=1e-9)
    assert r.r2 == pytest.approx(round(r2, 9), abs=1e-9)
    assert 0 < r.alpha < 1  # sublinear growth: vocabulary recycles


def test_gate_confusion_metrics_pin(spark):
    """Hand-built 2x2: cells (6,2,1,11); every metric recomputed."""
    import math as _m

    rows = (
        [(1, 1)] * 6 + [(1, 0)] * 2 + [(0, 1)] * 1 + [(0, 0)] * 11
    )
    df = spark.createDataFrame(rows, "t int, p int")
    from mcas_question2_etl_spark.operators.evaluation import (
        gate_confusion_metrics,
    )
    from pyspark.sql import functions as F

    r = gate_confusion_metrics(
        df, F.col("t") == 1, F.col("p") == 1
    ).collect()[0]
    a, b, c, d = 6.0, 2.0, 1.0, 11.0
    assert (r.n11, r.n10, r.n01, r.n00) == (6, 2, 1, 11)
    mcc = (a * d - b * c) / _m.sqrt((a + b) * (a + c) * (d + b) * (d + c))
    assert r.mcc == pytest.approx(round(mcc, 9), abs=1e-12)
    assert r.youden_j == pytest.approx(
        round(a / (a + b) + d / (d + c) - 1, 9), abs=1e-12
    )
    assert r.f1 == pytest.approx(
        round(2 * a / (2 * a + b + c), 9), abs=1e-12
    )
    orr = (a * d) / (b * c)
    se = _m.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert r.odds_ratio == pytest.approx(round(orr, 9), abs=1e-12)
    assert r.log_or_lo == pytest.approx(
        round(_m.log(orr) - 1.96 * se, 9), abs=1e-12
    )
    assert r.log_or_hi == pytest.approx(
        round(_m.log(orr) + 1.96 * se, 9), abs=1e-12
    )


def test_gate_confusion_zero_cell(spark):
    """A zero cell NULLs the odds-ratio family but not MCC/F1."""
    rows = [(1, 1)] * 4 + [(0, 0)] * 5 + [(0, 1)] * 2
    df = spark.createDataFrame(rows, "t int, p int")
    from mcas_question2_etl_spark.operators.evaluation import (
        gate_confusion_metrics,
    )
    from pyspark.sql import functions as F

    r = gate_confusion_metrics(
        df, F.col("t") == 1, F.col("p") == 1
    ).collect()[0]
    assert r.n10 == 0
    assert r.odds_ratio is None and r.log_or_lo is None
    assert r.mcc is not None and r.f1 is not None
