"""Wave-105 hand pins: weighted Slope-One CF and Dunning keyness.
Slope-One against a plain-Python reference (deviation table, weighted
prediction, MAE) on a hand-built rating matrix, plus the
constant-offset pole where predictions are exact (MAE 0); keyness
against a plain-Python G2 recomputation and the overused-only
convention.

Covered spec names: slope_one_rating_eval, dunning_keyness_sources.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from mcas_question2_etl_spark.operators.recommend import slope_one_eval
from mcas_question2_etl_spark.operators.text import dunning_keyness


def _ratings_df(spark, triples):
    return spark.createDataFrame(triples, "u long, i long, r long")


def _slope_one_ref(triples, mod=10):
    train = [(u, i, r) for u, i, r in triples if (u + i) % mod != 0]
    test = [(u, i, r) for u, i, r in triples if (u + i) % mod == 0]
    by_user = defaultdict(dict)
    for u, i, r in train:
        by_user[u][i] = r
    sumdiff = defaultdict(int)
    cnt = defaultdict(int)
    for u, items in by_user.items():
        for i, ri in items.items():
            for j, rj in items.items():
                if i != j:
                    sumdiff[(i, j)] += ri - rj
                    cnt[(i, j)] += 1
    ae_s1 = ae_um = 0.0
    n_pred = 0
    for u, i, r in test:
        num = den = 0
        for j, rj in by_user.get(u, {}).items():
            if (i, j) in cnt:
                num += sumdiff[(i, j)] + rj * cnt[(i, j)]
                den += cnt[(i, j)]
        if den:
            n_pred += 1
            ae_s1 += abs(num / den - r)
            m = sum(by_user[u].values()) / len(by_user[u])
            ae_um += abs(m - r)
    return len(train), len(test), n_pred, ae_s1 / n_pred, ae_um / n_pred


def test_slope_one_matches_reference(spark):
    triples = []
    base = {1: 5, 2: 9, 3: 3, 4: 7, 5: 6}
    for u in range(1, 13):
        for i, b in base.items():
            triples.append((u, i, b + (u * i) % 4))
    out = slope_one_eval(
        _ratings_df(spark, triples), "u", "i", "r"
    ).collect()[0]
    n_tr, n_te, n_p, mae1, maeu = _slope_one_ref(triples)
    assert out.n_train == n_tr
    assert out.n_test == n_te
    assert out.n_predictable == n_p
    assert out.mae_slope_one == pytest.approx(mae1, abs=1e-6)
    assert out.mae_user_mean == pytest.approx(maeu, abs=1e-6)


def test_slope_one_constant_offsets_exact(spark):
    # every user rates every item as (user bias + item bias): the
    # deviation dev_ij = b_i - b_j exactly, so predictions are exact
    # and MAE is 0 while the user-mean baseline is not
    item_bias = {1: 2, 2: 5, 3: 9, 4: 13}
    triples = [
        (u, i, u + b) for u in range(1, 11) for i, b in item_bias.items()
    ]
    out = slope_one_eval(
        _ratings_df(spark, triples), "u", "i", "r"
    ).collect()[0]
    assert out.n_predictable > 0
    assert out.mae_slope_one == pytest.approx(0.0, abs=1e-9)
    assert out.mae_user_mean > 1.0


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def _g2_ref(docs, group, token):
    toks = [(g, t) for g, txt in docs for t in txt.split(" ") if t]
    n = len(toks)
    o11 = sum(1 for g, t in toks if g == group and t == token)
    tot_t = sum(1 for _, t in toks if t == token)
    n_g = sum(1 for g, _ in toks if g == group)
    cells = [
        (o11, tot_t * n_g / n),
        (tot_t - o11, tot_t * (n - n_g) / n),
        (n_g - o11, (n - tot_t) * n_g / n),
        (n - tot_t - n_g + o11, (n - tot_t) * (n - n_g) / n),
    ]
    return 2.0 * sum(o * math.log(o / e) for o, e in cells if o > 0)


def test_keyness_matches_reference(spark):
    docs = [
        ("a", "cat cat cat dog fish"),
        ("a", "cat dog dog bird"),
        ("b", "fish fish fish bird bird"),
        ("b", "dog fish bird bird bird"),
    ]
    out = dunning_keyness(_docs_df(spark, docs), top_k=3).collect()
    by_key = {(r.source, r.token): r for r in out}
    # 'cat' is the signature of source a (never appears in b)
    assert ("a", "cat") in by_key
    r = by_key[("a", "cat")]
    assert r.rank == 1
    assert r.g2 == pytest.approx(_g2_ref(docs, "a", "cat"), abs=1e-3)
    # 'bird' dominates source b
    rb = by_key[("b", "bird")]
    assert rb.rank == 1
    assert rb.g2 == pytest.approx(_g2_ref(docs, "b", "bird"), abs=1e-3)
    # only overused terms rank: 'cat' cannot appear for b
    assert ("b", "cat") not in by_key


def test_keyness_balanced_token_excluded(spark):
    # a token spread exactly proportionally has O = E in every group:
    # not overused anywhere, so it never ranks
    docs = [
        ("a", "even odd odd"),
        ("b", "even odd odd"),
    ]
    out = dunning_keyness(_docs_df(spark, docs), top_k=5).collect()
    assert all(r.token != "even" for r in out)
    assert all(r.token != "odd" for r in out)
