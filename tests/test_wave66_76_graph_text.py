"""Hand-computed pins for the round-4 wave 66-76 graph / text /
sketch / spatial specs (VERDICT r4 #2) — expected values derived
independently in-test (brute force python), never from the SQL twin.

Covered spec names: bfs_layers_copurchase, adamic_adar_links,
harmonic_centrality_seeds, textrank_keywords, kneser_ney_doc_scores,
doremi_domain_weights, js_divergence_sources, burrows_delta_sources,
ams_f2_user_frequency, ripley_k_suppliers.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from mcas_question2_etl_spark.operators import graph_metrics, text
from mcas_question2_etl_spark.operators.sketches import ams_f2_accuracy


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


# path 0-1-2-3-4 plus branch 0-5-6
_GRAPH = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6)]


def test_bfs_layers_pin(spark):
    """Seed {0} on the path+branch graph: layers {0}, {1,5}, {2,6},
    {3} — counts AND node-id checksums."""
    out = {
        r.dist: (r.n_nodes, r.node_checksum)
        for r in graph_metrics.bfs_layers(
            _edges(spark, _GRAPH), seed_mod=50, depth=3
        ).collect()
    }
    assert out == {0: (1, 0), 1: (2, 6), 2: (2, 8), 3: (1, 3)}


def test_harmonic_centrality_pin(spark):
    """Seed {0}: 2 nodes at hop 1, 2 at hop 2, 1 at hop 3 ->
    H = 2 + 2/2 + 1/3."""
    r = graph_metrics.harmonic_centrality_seeds(
        _edges(spark, _GRAPH), seed_mod=101, depth=3
    ).collect()
    assert len(r) == 1 and r[0].seed == 0
    assert (r[0].n_hop1, r[0].n_hop2, r[0].n_hop3) == (2, 2, 1)
    assert r[0].harmonic == pytest.approx(round(2 + 1 + 1 / 3, 6))


def test_adamic_adar_pin(spark):
    """Brute-force AA scores over all non-adjacent pairs of a small
    graph (degrees well under the hub cap)."""
    edges = [(1, 2), (2, 3), (1, 4), (3, 4), (2, 5)]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if common:
                expect[(u, v)] = (
                    len(common),
                    round(sum(1.0 / math.log(len(adj[w])) for w in common), 6),
                )
    got = {
        (r.u, r.v): (r.common_neighbors, r.aa_score)
        for r in graph_metrics.adamic_adar_links(
            _edges(spark, edges), top_n=20
        ).collect()
    }
    assert got == expect
    # best pair: (2,4) shares two DEGREE-2 neighbors (1/ln2 each),
    # beating (1,3) whose shared node 2 is higher-degree (1/ln3)
    assert max(got, key=lambda k: got[k][1]) == (2, 4)


def test_adamic_adar_hub_cap_excludes_hub_wedges(spark):
    """A degree-3 middle node is excluded at max_degree=2, so pairs
    whose ONLY common neighbor is the hub disappear."""
    edges = [(1, 2), (2, 3), (2, 4)]  # 2 is the hub (deg 3)
    got = graph_metrics.adamic_adar_links(
        _edges(spark, edges), top_n=20, max_degree=2
    ).collect()
    assert got == []


# ── textrank_keywords ──────────────────────────────────────────────────


def test_textrank_pin(spark):
    """Two damped PageRank rounds over the adjacent-token graph of
    'a b a c', recomputed in python edge for edge."""
    df = spark.createDataFrame([(1, "a b a c")], "doc_id long, text string")
    # build the same symmetrized weighted graph
    toks = "a b a c".split()
    wt = Counter()
    for w1, w2 in zip(toks, toks[1:]):
        if w1 != w2:
            wt[(w1, w2)] += 1
            wt[(w2, w1)] += 1
    deg = Counter()
    for (w1, _), c in wt.items():
        deg[w1] += c
    pr = {w: 1.0 for w in deg}
    for _ in range(2):
        inc = defaultdict(float)
        for (w1, w2), c in wt.items():
            inc[w2] += (c / deg[w1]) * pr[w1]
        pr = {w: 0.15 + 0.85 * inc[w] for w in deg}
    got = {
        r.word: r.score
        for r in text.textrank_keywords(df, rounds=2, top_n=10).collect()
    }
    assert set(got) == set(pr)
    for w, s in pr.items():
        assert got[w] == pytest.approx(round(s, 6), abs=1e-9), w


# ── kneser_ney_doc_scores ──────────────────────────────────────────────


def test_kneser_ney_pin(spark):
    """Two-doc corpus: interpolated KN probabilities (D = 0.75,
    continuation/history counts) recomputed by hand per bigram."""
    docs = [(1, "a b a c"), (2, "b a b")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bigs = Counter()
    per_doc = {}
    for did, t in docs:
        ts = t.split()
        per_doc[did] = list(zip(ts, ts[1:]))
        bigs.update(per_doc[did])
    c1 = Counter()
    n_cont = Counter()
    n_hist = Counter()
    for (w1, w2), c in bigs.items():
        c1[w1] += c
        n_cont[w1] += 1
        n_hist[w2] += 1
    t_types = len(bigs)
    d = 0.75

    def p_kn(w1, w2):
        return max(bigs[(w1, w2)] - d, 0.0) / c1[w1] + d * n_cont[w1] / c1[
            w1
        ] * (n_hist[w2] / t_types)

    got = {
        r.doc_id: r
        for r in text.kneser_ney_bigram(df, discount=0.75).collect()
    }
    for did, pairs in per_doc.items():
        nll = sum(-math.log(p_kn(w1, w2)) for w1, w2 in pairs) / len(pairs)
        assert got[did].n_bigrams == len(pairs)
        assert got[did].mean_nll_kn == pytest.approx(nll, abs=1e-12)
    # Kneser-Ney signature: total probability mass from any history
    # stays normalized-ish (sanity that discounting was applied)
    assert abs(sum(p_kn("a", w) for w in ("a", "b", "c")) - 1.0) < 0.3


# ── doremi_domain_weights ──────────────────────────────────────────────


def test_doremi_pin(spark):
    """Two domains, one dominated by a rare token: excess loss and the
    exp-reweighted shares recomputed by hand."""
    docs = [(1, "x x y", "s1"), (2, "y z", "s2")]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    corpus = Counter("x x y y z".split())
    n = sum(corpus.values())
    per_src = {"s1": Counter("x x y".split()), "s2": Counter("y z".split())}
    mean_nll = {
        s: sum(c * -math.log(corpus[t] / n) for t, c in cnt.items())
        / sum(cnt.values())
        for s, cnt in per_src.items()
    }
    ntok = {s: sum(cnt.values()) for s, cnt in per_src.items()}
    gm = sum(ntok[s] * mean_nll[s] for s in ntok) / sum(ntok.values())
    raw = {
        s: (ntok[s] / sum(ntok.values()))
        * math.exp(mean_nll[s] - gm)
        for s in ntok
    }
    z = sum(raw.values())
    got = {r.source: r for r in text.doremi_domain_weights(df).collect()}
    for s in ("s1", "s2"):
        assert got[s].n_tokens == ntok[s]
        assert got[s].mean_nll == pytest.approx(round(mean_nll[s], 6), abs=1e-9)
        assert got[s].excess == pytest.approx(round(mean_nll[s] - gm, 6), abs=1e-9)
        assert got[s].weight == pytest.approx(round(raw[s] / z, 6), abs=1e-9)
    # the rare-token domain is the harder one and gets upweighted
    assert got["s2"].excess > 0 and got["s2"].weight > ntok["s2"] / 5


# ── js_divergence_sources ──────────────────────────────────────────────


def test_js_divergence_pin(spark):
    """Identical sources -> JS = 0; a hand-computed asymmetric pair."""
    docs = [(1, "x x y", "s1"), (2, "x y y", "s2"), (3, "x x y", "s3")]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    p = {"x": 2 / 3, "y": 1 / 3}
    q = {"x": 1 / 3, "y": 2 / 3}

    def kl(a, b):
        return sum(
            a[t] * math.log(a[t] / ((a[t] + b[t]) / 2)) for t in a if a[t] > 0
        )

    js = 0.5 * kl(p, q) + 0.5 * kl(q, p)
    got = {
        (r.source_a, r.source_b): r
        for r in text.js_divergence_pairs(df).collect()
    }
    assert got[("s1", "s3")].js == pytest.approx(0.0)
    assert got[("s1", "s2")].js == pytest.approx(round(js, 6), abs=1e-9)
    assert got[("s1", "s2")].js_distance == pytest.approx(
        round(math.sqrt(js), 6), abs=1e-9
    )
    assert got[("s1", "s2")].js <= math.log(2) + 1e-12


# ── burrows_delta_sources ──────────────────────────────────────────────


def test_burrows_delta_pin(spark):
    """Three sources: per-type relative frequencies z-scored with the
    POPULATION sd across sources, zero-variance types skipped; Delta
    recomputed by hand."""
    docs = [
        (1, "x x y z", "s1"),
        (2, "x y y z", "s2"),
        (3, "x y z z", "s3"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    srcs = {"s1": "x x y z", "s2": "x y y z", "s3": "x y z z"}
    freq = {
        s: {
            t: c / len(txt.split())
            for t, c in Counter(txt.split()).items()
        }
        for s, txt in srcs.items()
    }
    types = sorted({t for f in freq.values() for t in f})
    kept = []
    zs = defaultdict(dict)
    for t in types:
        vals = [freq[s].get(t, 0.0) for s in sorted(srcs)]
        mu = sum(vals) / len(vals)
        sd = math.sqrt(sum(v * v for v in vals) / len(vals) - mu * mu)
        if sd > 0:
            kept.append(t)
            for s, v in zip(sorted(srcs), vals):
                zs[s][t] = (v - mu) / sd
    delta12 = sum(abs(zs["s1"][t] - zs["s2"][t]) for t in kept) / len(kept)
    got = {
        (r.source_a, r.source_b): r
        for r in text.burrows_delta(df).collect()
    }
    assert got[("s1", "s2")].n_terms == len(kept)
    assert got[("s1", "s2")].delta == pytest.approx(round(delta12, 6), abs=1e-9)


# ── ams_f2_user_frequency ──────────────────────────────────────────────


def test_ams_f2_pin(spark):
    """Exact F2 plus the sketch estimate replicated in python with the
    identical portable md5 sign family — the whole construction is
    integer-exact, so the match is equality, not tolerance."""
    keys = ["u1"] * 3 + ["u2"] * 2 + ["u3"] * 2 + ["u4"]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    counts = Counter(keys)
    f2 = sum(c * c for c in counts.values())

    def sign(k, r):
        h = hashlib.md5(f"{k}|{r}".encode()).hexdigest()[:15]
        return (int(h, 16) % 2) * 2 - 1

    s = [
        sum(sign(k, r) * c for k, c in counts.items()) for r in range(16)
    ]
    gsums = [sum(x * x for x in s[g * 4 : (g + 1) * 4]) for g in range(4)]
    gs = sorted(gsums)
    est = (gs[1] + gs[2]) / 2 / 4  # median of 4 group sums / group_size
    r = ams_f2_accuracy(df, "k").collect()[0]
    assert (r.n_keys, r.f2_exact) == (4, f2)
    assert r.f2_est == pytest.approx(est, abs=1e-12)
    assert r.rel_err == pytest.approx(round(abs(est - f2) / f2, 6), abs=1e-9)


# ── ripley_k_suppliers ─────────────────────────────────────────────────


def test_ripley_k_pin(spark):
    """Three points, two of them ~1.1 km apart: pair counts per radius
    recomputed with the identical haversine, K = A/(n(n-1)) * 2*count."""
    from mcas_question2_etl_spark.operators.spatial import ripley_k

    pts = [(1, 0.0, 0.0), (2, 0.01, 0.0), (3, 10.0, 10.0)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")

    def hav(lat1, lon1, lat2, lon2):
        rad = 3.141592653589793 / 180
        dlat = (lat2 - lat1) * rad / 2
        dlon = (lon2 - lon1) * rad / 2
        a = math.sin(dlat) ** 2 + math.cos(lat1 * rad) * math.cos(
            lat2 * rad
        ) * math.sin(dlon) ** 2
        return 6371008.8 * 2 * math.asin(math.sqrt(a))

    dists = [
        round(hav(*pts[i][1:], *pts[j][1:]), 6)
        for i in range(3)
        for j in range(i + 1, 3)
    ]
    area = 1e12
    for r_m in (2000.0, 3_000_000.0):
        cnt = sum(1 for d in dists if d <= r_m)
        out = {
            row.r_m: row
            for row in ripley_k(
                df, "id", [2000.0, 3_000_000.0], f"{area!r}"
            ).collect()
        }
        assert out[r_m].n_points == 3
        assert out[r_m].pairs_within == cnt
        k = area / (3 * 2) * (2.0 * cnt)
        # r8 contract: intensive CSR ratio K(r)/(pi r^2), not raw K
        assert out[r_m].k_csr_ratio == pytest.approx(
            round(k / (math.pi * r_m * r_m), 4), abs=1e-6
        )
        assert out[r_m].l_est == pytest.approx(
            round(math.sqrt(k / math.pi), 4), rel=1e-9
        )
    # the close pair is inside 2 km, the far point only inside 3000 km
    assert out[2000.0].pairs_within == 1 and out[3_000_000.0].pairs_within == 3
