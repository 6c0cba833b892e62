"""Wave-64 tests: Shapley efficiency axiom + hand-computed lattice,
Wilson CI pins, stratified ATE on a planted effect, rich-club density,
Elias-gamma bit math."""

from __future__ import annotations

import datetime as dt
import math


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")


def test_shapley_single_channel_gets_all_credit(spark, tmp_path):
    """Only click-touched users convert (rate 1), untouched never:
    Shapley gives click the full lift and view/signup zero."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 10 users: click then purchase
    for u in range(10):
        eid += 1
        rows.append((eid, base, u, "click", 1.0, "{}"))
        eid += 1
        rows.append((eid, base + dt.timedelta(minutes=1), u, "purchase", 1.0, "{}"))
    # 10 users: error only (mask 0, no conversion)
    for u in range(10, 20):
        eid += 1
        rows.append((eid, base, u, "error", 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    from mcas_question2_etl_spark.plans.graph_specs import shapley_channel_attribution

    out = {r.channel: r.shapley
           for r in shapley_channel_attribution(spark, str(tmp_path)).collect()}
    # v({click}) = 1, v(empty) = 0, every other cohort absent -> 0.
    # click's only nonzero marginal is joining the empty set (w=1/3);
    # view/signup each DESTROY the click cohort's rate when they join
    # it (v({c,x})=0 absent) -> -1/6 each. Efficiency: the three sum
    # to v(grand) - v(empty) = 0.
    assert math.isclose(out["click"], 1.0 / 3, abs_tol=1e-6)
    assert math.isclose(out["view"], -1.0 / 6, abs_tol=1e-6)
    assert math.isclose(out["signup"], -1.0 / 6, abs_tol=1e-6)
    # values are rounded to 6dp before summing -> up to 1.5e-6 slack
    assert math.isclose(sum(out.values()), 0.0, abs_tol=2e-6)


def test_shapley_efficiency_on_two_channels(spark, tmp_path):
    """click+view cohort converts at 1.0, singles at 0.5, empty at 0:
    shapley(click)+shapley(view) must equal the weighted marginal sums
    the 3-player formula assigns (hand-computed)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def user(u, types, conv):
        nonlocal eid
        for t in types:
            eid += 1
            rows.append((eid, base, u, t, 1.0, "{}"))
        if conv:
            eid += 1
            rows.append((eid, base + dt.timedelta(minutes=9), u, "purchase", 1.0, "{}"))

    u = 0
    for conv in (True, True):  # both-channel users convert
        user(u, ["click", "view"], conv); u += 1
    for conv in (True, False):  # click-only: rate 0.5
        user(u, ["click"], conv); u += 1
    for conv in (True, False):  # view-only: rate 0.5
        user(u, ["view"], conv); u += 1
    user(u, ["error"], False); u += 1  # empty cohort, rate 0
    _write_events(spark, tmp_path, rows)
    from mcas_question2_etl_spark.plans.graph_specs import shapley_channel_attribution

    out = {r.channel: r.shapley
           for r in shapley_channel_attribution(spark, str(tmp_path)).collect()}
    # per the exact 3-player formula with v(c)=v(v)=.5, v(cv)=1, else 0:
    # shap(click) = 1/3*.5 + 1/6*.5 + 1/6*0 + 1/3*0 = 0.25 ; same for view
    assert math.isclose(out["click"], 0.25, abs_tol=1e-6)
    assert math.isclose(out["view"], 0.25, abs_tol=1e-6)
    # signup: joining {c}, {v}, {c,v} destroys their rates (cohorts with
    # signup don't exist -> 0), so its shapley is negative
    assert out["signup"] < 0


def test_wilson_ci_pin(spark, tmp_path):
    """n=100, p=0.5: the 95% Wilson interval is (0.404, 0.596)."""
    rows = [(i, "t", "en" if i < 50 else "de", "s", 10) for i in range(100)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/documents.parquet")
    from mcas_question2_etl_spark.plans.graph_specs import wilson_ci_by_source

    r = wilson_ci_by_source(spark, str(tmp_path)).collect()[0]
    assert r.n == 100 and r.p == 0.5
    assert math.isclose(r.ci_lo, 0.404, abs_tol=5e-4)
    assert math.isclose(r.ci_hi, 0.596, abs_tol=5e-4)
    assert math.isclose(r.ci_lo + r.ci_hi, 1.0, abs_tol=1e-9)  # symmetry at p=.5


def test_stratified_ate_planted_effect(spark, tmp_path):
    """Within every stratum treated users purchase exactly 10 more:
    ATE = 10 regardless of the (confounded) stratum sizes."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    u = 0

    def user(n_ev, treated, purchase_value):
        nonlocal eid, u
        for i in range(n_ev - 1 - (1 if treated else 0)):
            eid += 1
            rows.append((eid, base, u, "click", 0.0, "{}"))
        if treated:
            eid += 1
            rows.append((eid, base, u, "signup", 0.0, "{}"))
        eid += 1
        rows.append((eid, base, u, "purchase", float(purchase_value), "{}"))
        u += 1

    # stratum 0 (n_events < 8): controls buy 5, treated buy 15
    for _ in range(4):
        user(4, False, 5)
    for _ in range(2):
        user(4, True, 15)
    # stratum 1 (8 <= n_events < 16): controls buy 50, treated buy 60
    for _ in range(3):
        user(10, False, 50)
    for _ in range(5):
        user(10, True, 60)
    _write_events(spark, tmp_path, rows)
    from mcas_question2_etl_spark.plans.graph_specs import stratified_ate_signup

    r = stratified_ate_signup(spark, str(tmp_path)).collect()[0]
    assert r.n_strata == 2
    assert r.n_users == 14
    assert math.isclose(r.ate, 10.0, abs_tol=1e-9)


def test_rich_club_complete_core(spark):
    """K4 core plus pendant nodes: at k=2 the club is exactly the K4
    (degree 3+pendants make core degrees > 2), phi = 1.0."""
    from mcas_question2_etl_spark.plans.graph_specs import _RICH_KS  # noqa: F401
    from mcas_question2_etl_spark.operators.graph_metrics import (
        cooccurrence_edges,  # noqa: F401
    )
    import pyspark.sql.functions as F
    from mcas_question2_etl_spark.plans import graph_specs as wave64

    # build edges directly through the plan's internals: K4 on 1..4,
    # plus pendants 5..8 hanging off nodes 1..4
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(1, 5), (2, 6), (3, 7), (4, 8)]
    e = spark.createDataFrame(edges, ["a", "b"])
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    k = 2
    club = deg.filter(F.col("d") > k)
    n_nodes = club.count()
    club_ids = {r.n for r in club.collect()}
    n_edges = len([1 for a, b in edges if a in club_ids and b in club_ids])
    assert n_nodes == 4 and n_edges == 6
    assert 2.0 * n_edges / (n_nodes * (n_nodes - 1)) == 1.0


def test_gamma_bits_math(spark, tmp_path):
    """Two docs sharing one term: postings [2, 5] -> first encodes 3
    (2*1+1=5 bits... no: bin(3)='11', 2*(2-1)+1=3 bits), gap 3 -> 3
    bits; total 6. Singleton term on doc 2: encodes 3 -> 3 bits."""
    rows = [
        (2, "shared", "en", "s", 6),
        (5, "shared solo", "en", "s", 11),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/documents.parquet")
    from mcas_question2_etl_spark.plans.graph_specs import postings_gamma_bits

    out = {r.df_bucket: r for r in
           postings_gamma_bits(spark, str(tmp_path)).collect()}
    # 'shared': df=2 -> bucket len(bin(2))=2; bits = gamma(3) + gamma(3)
    #  = 3 + 3 = 6.  'solo': df=1 -> bucket 1; bits = gamma(6) = 5.
    assert out[2].n_terms == 1 and out[2].gamma_bits == 6
    assert out[1].n_terms == 1 and out[1].gamma_bits == 5
    assert math.isclose(out[2].bits_per_posting, 3.0, abs_tol=1e-9)
