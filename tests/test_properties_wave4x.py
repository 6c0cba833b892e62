"""Property tests for the wave-40+ statistical operators: each one is
replayed against an independent pure-Python implementation on small
randomized inputs (hypothesis), so the Spark expression tree and the
reference math are two genuinely different codepaths."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 50)),
        min_size=4,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_kaplan_meier_matches_python_replay(spark, pairs):
    from mcas_question2_etl_spark.operators.survival import kaplan_meier

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, (first_day, span) in enumerate(pairs):
        for day in {first_day, first_day + span}:
            eid += 1
            rows.append((eid, base + dt.timedelta(days=day), uid, "c", 1.0))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = {r.t_days: (r.n_risk, r.n_events, r.survival)
           for r in kaplan_meier(df, censor_days=7).collect()}

    # python replay
    per_user = {}
    for uid, (first_day, span) in enumerate(pairs):
        per_user[uid] = (first_day, first_day + span)
    horizon = max(last for _, last in per_user.values())
    lifetimes = [
        (last - first, 1 if last <= horizon - 7 else 0)
        for first, last in per_user.values()
    ]
    death_times = sorted({t for t, obs in lifetimes if obs})
    surv = 1.0
    for t in death_times:
        n_risk = sum(1 for lt, _ in lifetimes if lt >= t)
        d = sum(1 for lt, obs in lifetimes if lt == t and obs)
        surv *= 1 - d / n_risk
        assert got[t][0] == n_risk and got[t][1] == d
        assert math.isclose(got[t][2], surv, rel_tol=1e-9)
    assert set(got) == set(death_times)


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=3,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_spearman_matches_python_replay(spark, xy):
    from mcas_question2_etl_spark.operators.evaluation import spearman_corr

    rows = [("g", float(a), float(b)) for a, b in xy]
    df = spark.createDataFrame(rows, ["g", "a", "b"])
    got = spearman_corr(df, "g", "a", "b").collect()[0].spearman_rho

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j) / 2  # average of ranks i+1..j
            for k in range(i, j):
                ranks[order[k]] = r
            i = j
        return ranks

    ra = avg_ranks([a for a, _ in xy])
    rb = avg_ranks([b for _, b in xy])
    n = len(xy)
    sa, sb = sum(ra), sum(rb)
    saa = sum(r * r for r in ra)
    sbb = sum(r * r for r in rb)
    sab = sum(x * y for x, y in zip(ra, rb))
    den = math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    want = (n * sab - sa * sb) / den if den > 0 else 0.0
    assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-12)


@given(
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1,
             max_size=25).filter(lambda e: any(a != b for a, b in e))
)
@settings(**_SETTINGS)
def test_assortativity_matches_python_replay(spark, edges):
    from mcas_question2_etl_spark.operators.graph_metrics import (
        degree_assortativity,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["a", "b"])
    got = degree_assortativity(df).collect()[0]

    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    deg = Counter(u for u, _ in sym)
    pts = [(deg[u], deg[v]) for u, v in sym]
    n = len(pts)
    su = sum(u for u, _ in pts)
    sv = sum(v for _, v in pts)
    suu = sum(u * u for u, _ in pts)
    svv = sum(v * v for _, v in pts)
    suv = sum(u * v for u, v in pts)
    den = math.sqrt((n * suu - su * su) * (n * svv - sv * sv))
    want = (n * suv - su * sv) / den if den > 0 else 0.0
    assert got.n_edges == n
    assert math.isclose(got.assortativity, want, rel_tol=1e-9, abs_tol=1e-12)


@given(
    st.lists(st.integers(1, 500), min_size=2, max_size=8),
    st.integers(1, 60),
)
@settings(**_SETTINGS)
def test_apportionment_matches_python_replay(spark, votes, seats):
    from mcas_question2_etl_spark.operators.apportion import (
        largest_remainder_seats,
    )

    rows = []
    for i, v in enumerate(votes):
        rows += [(f"p{i:02d}",)] * v
    df = spark.createDataFrame(rows, ["party"])
    got = {r.party: r.total_seats for r in
           largest_remainder_seats(df, "party", seats).collect()}

    total = sum(votes)
    floors = [v * seats // total for v in votes]
    rems = [(v * seats) % total for v in votes]
    left = seats - sum(floors)
    order = sorted(range(len(votes)), key=lambda i: (-rems[i], f"p{i:02d}"))
    want = dict()
    for rank, i in enumerate(order):
        want[f"p{i:02d}"] = floors[i] + (1 if rank < left else 0)
    assert got == want
    assert sum(got.values()) == seats


@given(
    st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(1, 100)),
        min_size=4,
        max_size=30,
    ).filter(lambda rows: all(
        sum(1 for g, _ in rows if g == grp) != 1
        for grp in {g for g, _ in rows}
    ))
)
@settings(**_SETTINGS)
def test_quantile_normalize_matches_python_replay(spark, rows_in):
    from mcas_question2_etl_spark.operators.encoding import quantile_normalize

    rows = [(g, v, i) for i, (g, v) in enumerate(rows_in)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    got = {r.id: r.normalized for r in
           quantile_normalize(df, "g", "v", "id").collect()}

    pooled = sorted(rows, key=lambda r: (r[1], r[2]))
    pooled_vals = [v for _, v, _ in pooled]
    N = len(pooled)
    want = {}
    for grp in {g for g, _, _ in rows}:
        members = sorted(
            [(v, i) for g, v, i in rows if g == grp]
        )
        ng = len(members)
        for r0, (v, i) in enumerate(members, start=1):
            idx = 1 + (r0 - 1) * (N - 1) // (ng - 1)
            want[i] = pooled_vals[idx - 1]
    assert got == want
