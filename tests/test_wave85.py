"""Wave-85 hand pins: personalized PageRank in exact integer fixed
point. Expected values recomputed independently in-test by running the
integer superstep recurrence in plain Python dicts over a tiny graph.

Covered spec names: personalized_pagerank_seeds.
"""

from __future__ import annotations

import pytest

from mcas_question2_etl_spark.operators import graph_metrics as gm


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


def _ppr_python(pairs, seed_mod, rounds=3):
    und = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = sorted({a for a, _ in und})
    deg = {v: sum(1 for s, _ in und if s == v) for v in nodes}
    Q = gm.PPR_Q
    r = {v: (Q if v % seed_mod == 0 else 0) for v in nodes}
    for _ in range(rounds):
        spread = {v: 0 for v in nodes}
        for s, d in und:
            spread[d] += r[s] // deg[s]
        r = {
            v: (Q * 15 // 100 if v % seed_mod == 0 else 0)
            + (spread[v] * 85) // 100
            for v in nodes
        }
    return r


def test_ppr_matches_python_superstep_recurrence(spark):
    # triangle 0-1-2 plus a pendant 3 off node 2; seed = node 0 only
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    expected = _ppr_python(pairs, seed_mod=10)
    out = {
        r.node: r
        for r in gm.ppr_fixed_point(
            _edges_df(spark, pairs), seed_mod=10, top_n=10
        ).collect()
    }
    assert set(out) == set(expected)
    for v, units in expected.items():
        assert out[v].ppr_units == units
        assert out[v].ppr == pytest.approx(units / gm.PPR_Q, abs=1e-6)
    assert out[0].is_seed and not out[3].is_seed
    # the returned order is the exact-integer total order of the
    # recurrence (here the degree-3 hub node 2 out-collects the seed)
    got_order = [
        r.node
        for r in gm.ppr_fixed_point(
            _edges_df(spark, pairs), seed_mod=10, top_n=10
        ).collect()
    ]
    want_order = sorted(expected, key=lambda v: (-expected[v], v))
    assert got_order == want_order
    assert got_order[0] == 2


def test_ppr_mass_conservation_bound(spark):
    # total end mass can never exceed seeds * (base + damped total):
    # integer floors only LEAK mass, they never mint it
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3)]
    seed_mod = 2  # seeds {0, 2, 4}
    expected = _ppr_python(pairs, seed_mod=seed_mod)
    out = gm.ppr_fixed_point(
        _edges_df(spark, pairs), seed_mod=seed_mod, top_n=10
    ).collect()
    assert {r.node: r.ppr_units for r in out} == expected
    total = sum(r.ppr_units for r in out)
    n_seeds = sum(1 for r in out if r.is_seed)
    # after convergence mass <= n_seeds * Q; 3 rounds stays under the
    # looser geometric bound too
    bound = n_seeds * gm.PPR_Q
    assert total <= bound
    assert total > 0


def test_ppr_isolated_seed_keeps_base_only(spark):
    # component {0,1} with seed 0; node 5 and 7 form a separate
    # seedless component that must end at exactly zero mass
    pairs = [(0, 1), (5, 7)]
    out = {
        r.node: r.ppr_units
        for r in gm.ppr_fixed_point(
            _edges_df(spark, pairs), seed_mod=10, top_n=10
        ).collect()
    }
    assert out[5] == 0 and out[7] == 0
    expected = _ppr_python(pairs, seed_mod=10)
    assert out == expected


def test_ppr_rejects_other_round_counts(spark):
    with pytest.raises(ValueError):
        gm.ppr_fixed_point(_edges_df(spark, [(0, 1)]), rounds=2)
