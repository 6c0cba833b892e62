"""Wave 163 — exact KNN-Shapley training-data valuation.

Brute-force pin: for a tiny embedding set, the suffix-sum telescoped
values must equal the DEFINITIONAL recursion (Jia et al. Theorem 1)
computed in pure python; the efficiency axiom (per-probe values sum
to the full-set K-NN utility); the helpful-vs-harmful sign property
(a point whose label matches its tight neighborhood values positive,
a mislabeled intruder negative); and SQL-twin equality. Spec:
knn_shapley_valuation_emb (plans/curation_specs.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from mcas_question2_etl_spark.operators.similarity import (
    knn_shapley_valuation,
    knn_shapley_valuation_sql,
)

_Q = 1 << 20


def _emb_rows(vecs):
    """vecs: list of (vec_id, [floats], label)."""
    return [(i, [float(x) for x in v], lab) for i, v, lab in vecs]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _cos(a, b):
    qa = [math.floor(x * _Q) for x in a]
    qb = [math.floor(x * _Q) for x in b]
    dot = sum(x * y for x, y in zip(qa, qb))
    return dot / math.sqrt(
        sum(x * x for x in qa) * sum(x * x for x in qb)
    )


def _hand(vecs, probe_mod=10, probe_cap=10_000, k=5):
    """Per-probe value maps vals[p][c] = s and full-set utilities."""
    by_id = {i: (v, lab) for i, v, lab in vecs}
    probes = [
        i for i, _, _ in vecs if i % probe_mod == 0 and i < probe_cap
    ]
    vals = {}
    util = {}
    for p in probes:
        pv, plab = by_id[p]
        cands = sorted(
            (
                (-_cos(by_id[c][0], pv), c)
                for c, _, _ in vecs
                if c != p
            )
        )
        order = [c for _, c in cands]
        n = len(order)
        m = [1 if by_id[c][1] == plab else 0 for c in order]
        s = [0.0] * n
        s[n - 1] = m[n - 1] / n
        for i in range(n - 2, -1, -1):
            s[i] = s[i + 1] + (m[i] - m[i + 1]) / k * min(k, i + 1) / (
                i + 1
            )
        vals[p] = dict(zip(order, s))
        util[p] = sum(m[:k]) / k
    return vals, util


def _fixture():
    # two tight clusters + one mislabeled intruder inside cluster 0
    vecs = []
    for i in range(8):
        vecs.append((i * 10, [1.0, 0.05 * i, 0.0, 0.1], 0))
    for i in range(8):
        vecs.append((i * 10 + 1, [0.0, 0.1, 1.0, 0.05 * i], 1))
    vecs.append((95, [1.0, 0.07, 0.0, 0.1], 1))  # intruder: looks 0, labeled 1
    return vecs


def test_matches_definitional_recursion_and_efficiency(spark):
    vecs = _fixture()
    vals, util = _hand(vecs)
    out = knn_shapley_valuation(
        _df(spark, _emb_rows(vecs)), top_n=20
    ).collect()
    got = {r.vec_id: r.shapley for r in out}
    # mean-over-probes per training point, from the definitional
    # recursion
    means = {}
    for p, m in vals.items():
        for c, s in m.items():
            means.setdefault(c, []).append(s)
    for vid, ss in means.items():
        if vid in got:
            assert got[vid] == pytest.approx(
                round(sum(ss) / len(ss), 6), abs=1e-6
            ), vid
    # efficiency axiom: per probe, the values sum to the full-set
    # K-NN utility
    for p in util:
        assert sum(vals[p].values()) == pytest.approx(
            util[p], abs=1e-9
        )


def test_intruder_is_most_harmful(spark):
    vecs = _fixture()
    out = knn_shapley_valuation(
        _df(spark, _emb_rows(vecs)), top_n=3
    ).collect()
    worst = [r for r in out if r.position == -1][0]
    assert worst.vec_id == 95
    assert worst.shapley < 0


def test_sql_twin_matches_spark_exactly(spark):
    vecs = [
        (
            i,
            [((i * j * 7) % 13) / 13.0 + 0.1 for j in range(1, 5)],
            (i * 3) % 2,
        )
        for i in range(40)
    ]
    r = knn_shapley_valuation(_df(spark, _emb_rows(vecs)), top_n=6).collect()
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[],"
        " label INTEGER)"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?, ?)", _emb_rows(vecs)
    )
    got = con.execute(knn_shapley_valuation_sql(top_n=6)).fetchall()
    assert got == [
        (x.position, x.vec_id, x.label, x.n_probes, x.shapley) for x in r
    ]
