"""Hand-computed pins for the round-4 wave 66-76 statistics specs
(VERDICT r4 #2). Every expected value is derived independently in-test
(pure python / brute force), so a convention mistake shared by the
Spark plan and its SQL oracle twin still fails here.

Covered spec names: levene_priority_price_spread,
mann_whitney_click_purchase, wilcoxon_signed_rank_daily,
friedman_event_type_ranks, mahalanobis_outliers_2d,
partial_correlation_qty_price, effect_sizes_click_purchase,
cramers_v_source_lang, theils_u_source_lang, hellinger_click_purchase,
anderson_darling_doclen, cochrans_q_events, somers_d_qty_discount,
capture_recapture_users, chao1_vocab_estimate, kendalls_w_event_types,
median_test_priority_price, cronbachs_alpha_event_types,
cem_att_building_segment, nelson_aalen_hazard,
decision_stump_totalprice, trimmed_mean_price.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from mcas_question2_etl_spark.operators import causal, evaluation, stump, survival
from mcas_question2_etl_spark.operators.sketches import (
    capture_recapture,
    chao1_richness,
)


def _gv(spark, pairs):
    return spark.createDataFrame(
        [(g, float(v)) for g, v in pairs], "g string, v double"
    )


# ── levene_priority_price_spread ───────────────────────────────────────


def test_levene_brown_forsythe_pin(spark):
    """Group A spread [1..5] vs constant group B: one-way F on the
    |x - group median| deviations, computed by hand (W = 8.0)."""
    data = [("a", v) for v in [1, 2, 3, 4, 5]] + [("b", 10)] * 4
    za = [abs(v - 3) for v in [1, 2, 3, 4, 5]]
    zb = [0.0] * 4
    allz = za + zb
    zbar = sum(allz) / len(allz)
    ssb = 5 * (sum(za) / 5 - zbar) ** 2 + 4 * (sum(zb) / 4 - zbar) ** 2
    ssw = sum((z - sum(za) / 5) ** 2 for z in za) + sum(
        (z - 0.0) ** 2 for z in zb
    )
    w_expect = (ssb / 1) / (ssw / (9 - 2))
    r = evaluation.levene_brown_forsythe(_gv(spark, data), "g", "v").collect()[0]
    assert (r.k, r.n) == (2, 9)
    assert (r.median_min, r.median_max) == (3.0, 10.0)
    assert r.w_stat == pytest.approx(round(w_expect, 6), abs=1e-9)
    assert r.w_stat == 8.0


# ── mann_whitney_click_purchase ────────────────────────────────────────


def test_mann_whitney_u_pin(spark):
    """A=[1,2,3], B=[2,3,4] with ties: average ranks 1, 2.5, 2.5, 4.5,
    4.5, 6 -> R_a = 8, U_a = 2; tie-corrected z recomputed by hand."""
    data = [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4)]
    r = evaluation.mann_whitney_u(_gv(spark, data), "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.u2_a, r.u_a) == (3, 3, 4, 2.0)
    ties = 6 + 6  # two tie groups of size 2
    var = (9 / 12) * (7 - ties / (6 * 5))
    z = (2.0 - 4.5) / math.sqrt(var)
    assert r.z == pytest.approx(round(z, 6), abs=1e-9)


# ── wilcoxon_signed_rank_daily ─────────────────────────────────────────


def test_wilcoxon_signed_rank_pin(spark):
    """d = [1, -2, 3, 4, -4, 0]: zero drops, |d| ranks 1,2,3,4.5,4.5;
    W+ = 1 + 3 + 4.5 = 8.5; tie-corrected z by hand."""
    paired = spark.createDataFrame(
        [(i, d) for i, d in enumerate([1, -2, 3, 4, -4, 0])],
        "day long, d long",
    )
    r = evaluation.wilcoxon_signed_rank(paired).collect()[0]
    assert (r.n_nonzero, r.w2_plus, r.w_plus) == (5, 17, 8.5)
    var = 5 * 6 * 11 / 24.0 - 6 / 48.0
    z = (8.5 - 5 * 6 / 4.0) / math.sqrt(var)
    assert r.z == pytest.approx(round(z, 6), abs=1e-9)


# ── friedman_event_type_ranks / kendalls_w_event_types ─────────────────


def _blocks(spark, rows):
    return spark.createDataFrame(rows, "day long, t string, c long")


def test_friedman_perfect_concordance_pin(spark):
    """3 blocks ranking 3 treatments identically: R = (3, 6, 9),
    Q = 12/(3*3*4) * 126 - 36 = 6; an incomplete block is excluded."""
    rows = [
        (1, "a", 1), (1, "b", 2), (1, "c", 3),
        (2, "a", 2), (2, "b", 4), (2, "c", 6),
        (3, "a", 1), (3, "b", 3), (3, "c", 5),
        (4, "a", 9), (4, "b", 9),  # incomplete: dropped
    ]
    r = evaluation.friedman_test(_blocks(spark, rows), "day", "t", "c").collect()[0]
    assert (r.n_blocks, r.k) == (3, 3)
    assert r.q_stat == pytest.approx(6.0, abs=1e-9)


def test_kendalls_w_pin(spark):
    """Perfect concordance -> W = 1; a tied block recomputed by hand
    through the tie-corrected formula."""
    rows = [
        (1, "a", 1), (1, "b", 2), (1, "c", 3),
        (2, "a", 2), (2, "b", 4), (2, "c", 6),
        (3, "a", 1), (3, "b", 3), (3, "c", 5),
    ]
    r = evaluation.kendalls_w(_blocks(spark, rows), "day", "t", "c").collect()[0]
    assert (r.n_blocks, r.k) == (3, 3)
    assert r.w == pytest.approx(1.0, abs=1e-9)

    # block 3 now ties a with b: avg ranks (1.5, 1.5, 3)
    rows_tied = rows[:6] + [(3, "a", 3), (3, "b", 3), (3, "c", 5)]
    ranks = {
        "a": 1 + 1 + 1.5,
        "b": 2 + 2 + 1.5,
        "c": 3 + 3 + 3,
    }
    n, k = 3, 3
    sum_r2 = sum(v * v for v in ranks.values())
    tt = 2**3 - 2  # one tie group of 2 in one block
    w_expect = (12 * sum_r2 - 3 * n * n * k * (k + 1) ** 2) / (
        n * n * k * (k * k - 1) - n * tt
    )
    r2 = evaluation.kendalls_w(
        _blocks(spark, rows_tied), "day", "t", "c"
    ).collect()[0]
    assert r2.w == pytest.approx(round(w_expect, 6), abs=1e-9)


# ── cronbachs_alpha_event_types ────────────────────────────────────────


def test_cronbachs_alpha_pin(spark):
    """Items (1,2,3) and (2,4,6) over 3 blocks: item variances 1 and 4,
    total-sum variance 9 -> alpha = 2 * (1 - 5/9) = 8/9."""
    rows = [
        (1, "a", 1), (1, "b", 2),
        (2, "a", 2), (2, "b", 4),
        (3, "a", 3), (3, "b", 6),
    ]
    r = evaluation.cronbachs_alpha(_blocks(spark, rows), "day", "t", "c").collect()[0]
    assert (r.n_blocks, r.k) == (3, 2)
    assert r.sum_item_var == pytest.approx(5.0)
    assert r.total_var == pytest.approx(9.0)
    assert r.alpha == pytest.approx(round(8 / 9, 6), abs=1e-9)


# ── mahalanobis_outliers_2d ────────────────────────────────────────────


def test_mahalanobis_outliers_pin(spark):
    """Points on the x=y diagonal plus one anti-diagonal outlier:
    per-point d2 recomputed with numpy from the same sample-covariance
    convention; outlier count exact at a custom threshold."""
    import numpy as np

    pts = [(float(i), float(i) + (0.25 if i % 2 == 0 else -0.25)) for i in range(12)]
    pts.append((6.0, -6.0))
    arr = np.array(pts)
    mx, my = arr.mean(axis=0)
    vx = arr[:, 0].var(ddof=1)
    vy = arr[:, 1].var(ddof=1)
    rho = np.cov(arr.T, ddof=1)[0, 1] / math.sqrt(vx * vy)
    zx = (arr[:, 0] - mx) / math.sqrt(vx)
    zy = (arr[:, 1] - my) / math.sqrt(vy)
    d2 = (zx * zx - 2 * rho * zx * zy + zy * zy) / (1 - rho * rho)
    df = spark.createDataFrame(pts, "x double, y double")
    r = evaluation.mahalanobis_outliers_2d(df, "x", "y", threshold=9.0).collect()[0]
    assert r.n == 13
    assert r.n_outliers == int((d2 > 9.0).sum()) >= 1
    assert r.mean_d2 == pytest.approx(round(float(d2.mean()), 6), abs=1e-6)
    assert r.max_d2 == pytest.approx(round(float(d2.max()), 6), abs=1e-6)


# ── partial_correlation_qty_price ──────────────────────────────────────


def test_partial_correlation_pin(spark):
    """x and y both driven by z: marginal r_xy is strong, the partial
    r_xy.z (numpy-recomputed) collapses toward zero."""
    import numpy as np

    rows = [
        (1.0, 2.0, 1.5), (2.0, 3.0, 1.5), (3.0, 5.0, 2.5),
        (4.0, 6.0, 3.5), (5.0, 9.0, 5.5), (6.0, 10.0, 5.5),
        (2.0, 4.0, 2.0), (5.0, 8.0, 4.0),
    ]
    arr = np.array(rows)
    rxy = np.corrcoef(arr[:, 0], arr[:, 1])[0, 1]
    rxz = np.corrcoef(arr[:, 0], arr[:, 2])[0, 1]
    ryz = np.corrcoef(arr[:, 1], arr[:, 2])[0, 1]
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    r = evaluation.partial_correlation(df, "x", "y", "z").collect()[0]
    assert r.n == 8
    assert r.r_xy == pytest.approx(round(rxy, 6), abs=1e-9)
    assert r.r_xz == pytest.approx(round(rxz, 6), abs=1e-9)
    assert r.r_yz == pytest.approx(round(ryz, 6), abs=1e-9)
    assert r.r_xy_given_z == pytest.approx(round(part, 6), abs=1e-9)


# ── effect_sizes_click_purchase ────────────────────────────────────────


def test_effect_sizes_pin(spark):
    """A=[2,4,6] vs B=[1,2,3]: pooled-SD Cohen's d, the
    1 - 3/(4N-9) Hedges factor, Glass's delta on the CONTROL (b) SD."""
    data = [("a", 2), ("a", 4), ("a", 6), ("b", 1), ("b", 2), ("b", 3)]
    va, vb = 4.0, 1.0  # sample variances
    sp = math.sqrt((2 * va + 2 * vb) / 4)
    d = (4.0 - 2.0) / sp
    corr = 1 - 3 / (4 * 6 - 9)
    r = evaluation.effect_sizes(_gv(spark, data), "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.mean_diff == pytest.approx(2.0)
    assert r.cohen_d == pytest.approx(round(d, 6), abs=1e-9)
    assert r.hedges_g == pytest.approx(round(d * corr, 6), abs=1e-9)
    assert r.glass_delta == pytest.approx(round(2.0 / math.sqrt(vb), 6), abs=1e-9)


# ── cramers_v_source_lang / theils_u_source_lang ───────────────────────


def test_cramers_v_perfect_association(spark):
    """Deterministic 2x2 (x == y): chi2 = n, V = 1; the Bergsma
    correction keeps a deterministic table at exactly 1."""
    rows = [("a", "1")] * 10 + [("b", "2")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    r = evaluation.cramers_v(df, "x", "y").collect()[0]
    assert (r.n, r.r, r.c) == (20, 2, 2)
    assert r.chi2 == pytest.approx(20.0)
    assert r.v == pytest.approx(1.0)
    assert r.v_corrected == pytest.approx(1.0)


def test_theils_u_asymmetric_dependence(spark):
    """x = y mod 2 with y uniform over 4 levels: knowing y determines
    x (U(x|y) = 1) but knowing x only halves the y space
    (U(y|x) = ln2/ln4 = 0.5)."""
    rows = [(str(y % 2), str(y)) for y in range(4) for _ in range(5)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = evaluation.theils_u(df, "x", "y").collect()[0]
    assert r.n == 20
    assert r.h_x == pytest.approx(round(math.log(2), 6), abs=1e-9)
    assert r.h_y == pytest.approx(round(math.log(4), 6), abs=1e-9)
    assert r.mutual_info == pytest.approx(round(math.log(2), 6), abs=1e-9)
    assert r.u_x_given_y == pytest.approx(1.0)
    assert r.u_y_given_x == pytest.approx(0.5)


# ── hellinger_click_purchase ───────────────────────────────────────────


def test_hellinger_binned_pins(spark):
    """Identical distributions -> H = 0; disjoint -> H = 1; a mixed
    case recomputed by hand (BC = sum sqrt(p*q))."""
    same = [("a", v) for v in [1.5, 5.5, 9.5]] + [("b", v) for v in [1.5, 5.5, 9.5]]
    r = evaluation.hellinger_binned(
        _gv(spark, same), "g", "v", "a", "b", 0.0, 24.0
    ).collect()[0]
    assert r.bhattacharyya == pytest.approx(1.0) and r.hellinger == pytest.approx(0.0)

    disjoint = [("a", 1.5)] * 3 + [("b", 20.5)] * 3
    r = evaluation.hellinger_binned(
        _gv(spark, disjoint), "g", "v", "a", "b", 0.0, 24.0
    ).collect()[0]
    assert r.bhattacharyya == pytest.approx(0.0) and r.hellinger == pytest.approx(1.0)

    mixed = [("a", 1.5), ("a", 1.5), ("a", 5.5), ("a", 9.5)] + [
        ("b", 1.5), ("b", 5.5), ("b", 5.5), ("b", 20.5)
    ]
    # bins: a -> {1: 2/4, 5: 1/4, 9: 1/4}; b -> {1: 1/4, 5: 2/4, 20: 1/4}
    bc = math.sqrt(0.5 * 0.25) + math.sqrt(0.25 * 0.5)
    r = evaluation.hellinger_binned(
        _gv(spark, mixed), "g", "v", "a", "b", 0.0, 24.0
    ).collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.bhattacharyya == pytest.approx(round(bc, 6), abs=1e-9)
    assert r.hellinger == pytest.approx(round(math.sqrt(1 - bc), 6), abs=1e-9)


# ── anderson_darling_doclen ────────────────────────────────────────────


def test_anderson_darling_2s_pin(spark):
    """A2_akN (Scholz-Stephens midrank version) recomputed directly
    from the textbook formula on two small tied samples."""
    a_vals = [1, 2, 3, 3, 5]
    b_vals = [2, 4, 4, 6]
    pooled = sorted(set(a_vals + b_vals))
    n_a, n_b = len(a_vals), len(b_vals)
    big_n = n_a + n_b
    total = 0.0
    for sample, n_s in ((a_vals, n_a), (b_vals, n_b)):
        s = 0.0
        for v in pooled:
            lj = (a_vals + b_vals).count(v)
            bj = sum(1 for x in a_vals + b_vals if x < v) + lj / 2.0
            mij = sum(1 for x in sample if x < v) + sample.count(v) / 2.0
            den = bj * (big_n - bj) - big_n * lj / 4.0
            if den > 0:
                s += (lj / big_n) * (big_n * mij - n_s * bj) ** 2 / den
        total += s / n_s
    a2_expect = (big_n - 1) / big_n * total

    data = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(data, "g string, v long")
    r = evaluation.anderson_darling_2s(df, "g", "v", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.n_values) == (5, 4, 6)
    assert r.a2 == pytest.approx(round(a2_expect, 6), abs=1e-9)


# ── cochrans_q_events ──────────────────────────────────────────────────


def test_cochrans_q_pin(spark):
    """Presence matrix u1{a,b,c} u2{a,b} u3{a} u4{a,c}: C = (4,2,2),
    T = 8, ΣR² = 18 -> Q = 2*(3*24 - 64)/(24 - 18) = 8/3."""
    pairs = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "a"), (4, "c"),
    ]
    df = spark.createDataFrame(pairs, "u long, t string")
    r = evaluation.cochrans_q(df, "u", "t").collect()[0]
    assert (r.n_blocks, r.k) == (4, 3)
    assert r.q_stat == pytest.approx(round(8 / 3, 6), abs=1e-9)


def test_cochrans_q_saturated_is_null(spark):
    """Every block hit all k treatments: zero variance -> NULL Q, the
    guard the round-4 spec documents."""
    pairs = [(u, t) for u in (1, 2) for t in ("a", "b")]
    df = spark.createDataFrame(pairs, "u long, t string")
    r = evaluation.cochrans_q(df, "u", "t").collect()[0]
    assert r.q_stat is None


# ── somers_d_qty_discount ──────────────────────────────────────────────


def test_somers_d_pin(spark):
    """Brute-force C/D/tie counts over all row pairs pin gamma and
    D_yx = (C-D)/(n(n-1)/2 - Tx) — the tie convention under test."""
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 3), (3, 1), (2, 2)]
    conc = disc = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dx = rows[j][0] - rows[i][0]
            dy = rows[j][1] - rows[i][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n = len(rows)
    from collections import Counter

    tx = sum(c * (c - 1) // 2 for c in Counter(x for x, _ in rows).values())
    d_yx = (conc - disc) / (n * (n - 1) / 2 - tx)
    df = spark.createDataFrame(rows, "x long, y long")
    r = evaluation.somers_d(df, "x", "y").collect()[0]
    assert (r.n, r.conc, r.disc) == (n, conc, disc)
    assert r.gamma == pytest.approx(round((conc - disc) / (conc + disc), 6), abs=1e-9)
    assert r.somers_d_yx == pytest.approx(round(d_yx, 6), abs=1e-9)


# ── capture_recapture_users / chao1_vocab_estimate ─────────────────────


def test_capture_recapture_pin(spark):
    """Window A sees keys {1,2,3}, window B sees {3,4}: Chapman
    N_hat = 4*3/2 - 1 = 5, se = sqrt(2)."""
    rows = [(1, 0), (2, 0), (3, 0), (3, 1), (4, 1)]
    df = spark.createDataFrame(rows, "k long, w int")
    r = capture_recapture(df, "k", "w = 0", "w = 1").collect()[0]
    assert (r.n1, r.n2, r.m_both) == (3, 2, 1)
    assert r.n_hat == pytest.approx(5.0)
    assert r.se == pytest.approx(round(math.sqrt(2.0), 2))


def test_chao1_pin(spark):
    """5 types: 3 singletons, 1 doubleton, 1 triple ->
    chao1 = 5 + 3*2/(2*2) = 6.5 (bias-corrected form)."""
    toks = ["a", "b", "c", "d", "d", "e", "e", "e"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    r = chao1_richness(df, "tok").collect()[0]
    assert (r.s_obs, r.f1, r.f2) == (5, 3, 1)
    assert r.chao1 == pytest.approx(6.5)


# ── median_test_priority_price ─────────────────────────────────────────


def test_median_test_pin(spark):
    """A=[1,2,3] B=[4,5,6]: grand median between 3 and 4, perfect
    separation -> chi2 = n = 6; a median-tied row drops."""
    data = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6)]
    r = evaluation.median_test(_gv(spark, data), "g", "v").collect()[0]
    assert (r.k, r.n_used, r.n_dropped, r.dof) == (2, 6, 0, 1)
    assert r.chi2 == pytest.approx(6.0)

    # odd pooled count: the exact middle value is dropped
    data2 = data + [("a", 3.5)]
    r2 = evaluation.median_test(_gv(spark, data2), "g", "v").collect()[0]
    assert (r2.n_used, r2.n_dropped) == (6, 1)


# ── cem_att_building_segment ───────────────────────────────────────────


def test_cem_att_pin(spark):
    """Two matched strata (one treated-only stratum excluded):
    ATT = [(30 - 2*5) + (30 - 0.5*30)] / 3 = 35/3."""
    rows = [
        # stratum (r1, n1, 0): treated 10, 20; control 5
        (True, "r1", "n1", 0, 10.0), (True, "r1", "n1", 0, 20.0),
        (False, "r1", "n1", 0, 5.0),
        # stratum (r1, n2, 0): treated 30; control 10, 20
        (True, "r1", "n2", 0, 30.0),
        (False, "r1", "n2", 0, 10.0), (False, "r1", "n2", 0, 20.0),
        # stratum (r1, n3, 0): treated only -> unmatched, excluded
        (True, "r1", "n3", 0, 99.0),
    ]
    units = spark.createDataFrame(
        rows, "treated boolean, region string, nation string, "
        "bal_bin int, spend double"
    )
    r = causal.cem_att(
        units, "treated", "spend", ["region", "nation", "bal_bin"], ["region"]
    ).collect()[0]
    assert (r.region, r.n_strata_matched, r.n_treated, r.n_control) == (
        "r1", 2, 3, 3,
    )
    assert r.att == pytest.approx(round(35 / 3, 4), abs=1e-9)


# ── nelson_aalen_hazard ────────────────────────────────────────────────


def test_nelson_aalen_pin(spark):
    """Lifetimes t=0 (1 obs), t=3 (2 obs), t=10 (censored): risk sets
    4, 3, 1 -> H(0) = 1/4, H(3) = 1/4 + 2/3; censored rows emit no
    hazard step."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid, days in [(1, [0, 3]), (2, [0, 3]), (3, [0, 10]), (4, [0])]:
        for d in days:
            rows.append((len(rows), base + dt.timedelta(days=d), uid, "click", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.t_days: r for r in survival.nelson_aalen(ev, censor_days=7).collect()}
    assert set(out) == {0, 3}
    assert (out[0].n_risk, out[0].n_events) == (4, 1)
    assert out[0].cum_hazard == pytest.approx(0.25)
    assert (out[3].n_risk, out[3].n_events) == (3, 2)
    assert out[3].cum_hazard == pytest.approx(round(0.25 + 2 / 3, 6))
    assert out[3].survival_fh == pytest.approx(
        round(math.exp(-(0.25 + 2 / 3)), 6), abs=1e-6
    )


# ── decision_stump_totalprice ──────────────────────────────────────────


def test_decision_stump_perfect_split(spark):
    """Labels 0 at x~10, 1 at x~200 over [0,256)x256 bins: the best
    split is the last negative bin, gain = root gini = 0.5."""
    rows = [(10.5, 0)] * 5 + [(200.5, 1)] * 5
    df = spark.createDataFrame(rows, "x double, y int")
    r = stump.decision_stump(df, "x", "y = 1", 0.0, 256.0).collect()[0]
    assert (r.n, r.n_pos, r.bin_split) == (10, 5, 10)
    assert r.threshold == pytest.approx(11.0)
    assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == (5, 0, 5, 5)
    assert r.gini_gain == pytest.approx(0.5)


# ── trimmed_mean_price (spec-level) ────────────────────────────────────


def test_trimmed_mean_price_pin(spark, tmp_path):
    """Values 1..10: 10%-per-side trim drops 1 and 10, mean(2..9) = 5.5."""
    li = spark.createDataFrame(
        [(i, 1, float(i)) for i in range(1, 11)],
        "l_orderkey long, l_linenumber int, l_extendedprice double",
    )
    li.write.mode("overwrite").parquet(str(tmp_path) + "/lineitem.parquet")
    from mcas_question2_etl_spark.plans.stats_specs import trimmed_mean_price

    r = trimmed_mean_price(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.k_trim) == (10, 1)
    assert r.trimmed_mean == pytest.approx(5.5)
