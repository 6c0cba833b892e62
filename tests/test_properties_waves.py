"""Hypothesis property tests for the round-2 wave operators: interval
algebra, Hilbert keys, transitive closure, edit-distance blocking.
Pure-Python properties run with full example counts; Spark-backed ones
use the suite's reduced-example settings."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mcas_question2_etl_spark.operators.hilbert import hilbert_key_py
from mcas_question2_etl_spark.operators.zorder import morton_key_py

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_PY_SETTINGS = dict(max_examples=200, deadline=None)


@given(
    x=st.integers(min_value=0, max_value=(1 << 16) - 1),
    y=st.integers(min_value=0, max_value=(1 << 16) - 1),
    order=st.integers(min_value=1, max_value=16),
)
@settings(**_PY_SETTINGS)
def test_hilbert_key_in_range_and_mask_consistent(x, y, order):
    """Key is always within [0, 4^order); masking high coordinate bits
    changes nothing (the operator's documented clamp)."""
    d = hilbert_key_py(x, y, order)
    assert 0 <= d < 1 << (2 * order)
    mask = (1 << order) - 1
    assert d == hilbert_key_py(x & mask, y & mask, order)


@given(order=st.integers(min_value=1, max_value=6))
@settings(**_PY_SETTINGS)
def test_hilbert_bijective_and_adjacent_all_orders(order):
    n = 1 << order
    pos = {}
    for x in range(n):
        for y in range(n):
            pos[hilbert_key_py(x, y, order)] = (x, y)
    assert len(pos) == n * n
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = pos[d], pos[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**_PY_SETTINGS)
def test_hilbert_runs_never_worse_than_double_morton(pts):
    """For ANY point set, the number of contiguous key runs under
    Hilbert stays within 2x of Morton's (and in aggregate beats it —
    see test_wave17); this guards against a pathological regression in
    the curve construction."""

    def runs(keys):
        ks = sorted(set(keys))
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b > a + 1)

    h = runs(hilbert_key_py(x, y, 8) for x, y in pts)
    m = runs(morton_key_py(x, y, 8) for x, y in pts)
    assert h <= 2 * m + 1


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 15)),
        min_size=0,
        max_size=12,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 15)),
        min_size=0,
        max_size=12,
    ),
    width=st.integers(min_value=1, max_value=40),
)
@settings(**_SETTINGS)
def test_overlap_join_hypothesis(spark, lefts, rights, width):
    from mcas_question2_etl_spark.operators.intervals import overlap_join

    lrows = [(i, s, s + d) for i, (s, d) in enumerate(lefts)]
    rrows = [(i, s, s + d) for i, (s, d) in enumerate(rights)]
    ldf = spark.createDataFrame(lrows, "l_id long, l_s long, l_e long")
    rdf = spark.createDataFrame(rrows, "r_id long, r_s long, r_e long")
    if not lrows or not rrows:
        return  # createDataFrame([], schema-str) still works, but the
        # brute force is trivially empty; skip degenerate shapes
    got = sorted(
        (r.l_id, r.r_id)
        for r in overlap_join(ldf, rdf, "l_s", "l_e", "r_s", "r_e", width)
        .select("l_id", "r_id")
        .collect()
    )
    want = sorted(
        (li, ri)
        for li, ls, le in lrows
        for ri, rs, re in rrows
        if ls <= re and rs <= le
    )
    assert got == want


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 10)),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_coalesce_intervals_hypothesis(spark, iv):
    from mcas_question2_etl_spark.operators.intervals import coalesce_intervals

    rows = [("k", s, s + d) for s, d in iv]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = sorted(
        (r.period_start, r.period_end, r.n_merged)
        for r in coalesce_intervals(df, ["k"], "s", "e").collect()
    )
    merged = []
    for s, e in sorted((s, e) for _, s, e in rows):
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += 1
        else:
            merged.append([s, e, 1])
    assert got == sorted((s, e, n) for s, e, n in merged)
    # disjointness: consecutive merged periods never touch
    for (s0, e0, _), (s1, e1, _) in zip(got, got[1:]):
        assert s1 > e0


@given(
    edges=st.sets(
        st.tuples(st.integers(1, 25), st.integers(0, 24)).filter(
            lambda e: e[1] < e[0]
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_transitive_closure_hypothesis(spark, edges):
    from mcas_question2_etl_spark.operators.closure import transitive_closure

    edf = spark.createDataFrame(sorted(edges), "child long, parent long")
    got = {
        (r.ancestor, r.descendant): r.depth
        for r in transitive_closure(edf).collect()
    }
    # python min-depth BFS
    parents = {}
    for c, p in edges:
        parents.setdefault(c, set()).add(p)
    want = {}
    for start in parents:
        frontier = {(p, 1) for p in parents[start]}
        seen = {}
        while frontier:
            nxt = set()
            for node, d in frontier:
                if node not in seen or seen[node] > d:
                    seen[node] = d
                    for p in parents.get(node, ()):
                        nxt.add((p, d + 1))
            frontier = nxt
        for anc, d in seen.items():
            want[(anc, start)] = d
    assert got == want


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5),
        min_size=2,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_edit_distance_pairs_hypothesis(spark, words):
    from mcas_question2_etl_spark.operators.editjoin import edit_distance_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.a_id, r.b_id) for r in edit_distance_pairs(df, "id", "s").collect()
    )
    want = sorted(
        (i, j)
        for (i, si), (j, sj) in itertools.combinations(rows, 2)
        if lev(si, sj) <= 1
    )
    assert got == want
