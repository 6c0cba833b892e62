"""Wave-86 hand pins: grid-bucketed DBSCAN. Expected labels are
recomputed independently in-test by a brute-force reference DBSCAN
(all-pairs neighbor search + BFS flood fill in plain Python) on
fixtures engineered to exercise every role: multi-point cores, border
points adopting a core's label, noise, eps-exact boundary distances,
cross-cell neighbor pairs (the 3x3 grid case), and duplicate
coordinates.

Covered spec names: dbscan_customer_sites.
"""

from __future__ import annotations

from collections import deque

import pytest

from mcas_question2_etl_spark.operators.spatial import dbscan_grid


def _ref_dbscan(pts, eps, min_pts):
    """Brute-force reference: all-pairs + BFS, min-id cluster labels,
    border = min core-neighbor label."""
    ids = sorted(pts)
    nbr = {
        i: [
            j
            for j in ids
            if (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            <= eps * eps
        ]
        for i in ids
    }
    core = {i for i in ids if len(nbr[i]) >= min_pts}
    # flood fill over core-core adjacency
    label = {}
    for seed in sorted(core):
        if seed in label:
            continue
        comp = []
        q = deque([seed])
        seen = {seed}
        while q:
            v = q.popleft()
            comp.append(v)
            for w in nbr[v]:
                if w in core and w not in seen:
                    seen.add(w)
                    q.append(w)
        lbl = min(comp)
        for v in comp:
            label[v] = lbl
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", label[i])
        else:
            core_nbrs = [label[j] for j in nbr[i] if j in core]
            if core_nbrs:
                out[i] = ("border", min(core_nbrs))
            else:
                out[i] = ("noise", None)
    return out


def _pts_df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in pts.items()],
        "pid long, x double, y double",
    )


def _run(spark, pts, eps, min_pts):
    rows = dbscan_grid(
        _pts_df(spark, pts), "pid", "x", "y", eps, min_pts
    ).collect()
    return {r.pid: (r.role, r.cluster_id) for r in rows}


def test_dbscan_core_border_noise_roles(spark):
    # dense blob (0-3), a border point 4 hanging off it, and far noise
    pts = {
        0: (0.0, 0.0),
        1: (0.5, 0.0),
        2: (0.0, 0.5),
        3: (0.5, 0.5),
        4: (1.5, 0.0),  # within eps of 1 only -> border
        5: (10.0, 10.0),  # noise
    }
    eps, min_pts = 1.0, 4
    got = _run(spark, pts, eps, min_pts)
    want = _ref_dbscan(pts, eps, min_pts)
    assert got == want
    assert got[0] == ("core", 0)
    assert got[4] == ("border", 0)
    assert got[5] == ("noise", None)


def test_dbscan_two_clusters_and_exact_eps_boundary(spark):
    # two 3-point chains exactly eps apart internally; the gap between
    # the chains exceeds eps so they must NOT merge
    pts = {
        0: (0.0, 0.0),
        1: (1.0, 0.0),
        2: (2.0, 0.0),
        10: (0.0, 5.0),
        11: (1.0, 5.0),
        12: (2.0, 5.0),
    }
    eps, min_pts = 1.0, 2
    got = _run(spark, pts, eps, min_pts)
    want = _ref_dbscan(pts, eps, min_pts)
    assert got == want
    assert {got[i][1] for i in (0, 1, 2)} == {0}
    assert {got[i][1] for i in (10, 11, 12)} == {10}


def test_dbscan_cross_cell_pairs_and_duplicates(spark):
    # points straddling cell boundaries (eps=1 -> cells of width 1)
    # plus exact duplicate coordinates piling into one site
    pts = {
        0: (0.99, 0.99),
        1: (1.01, 1.01),  # different cell, distance ~0.028
        2: (0.99, 1.01),
        3: (5.0, 5.0),
        4: (5.0, 5.0),  # duplicate of 3
        5: (5.0, 5.0),  # duplicate of 3
    }
    eps, min_pts = 1.0, 3
    got = _run(spark, pts, eps, min_pts)
    want = _ref_dbscan(pts, eps, min_pts)
    assert got == want
    # the duplicate pile is its own core cluster labeled by min id 3
    assert got[3] == ("core", 3) and got[4] == ("core", 3)
    # the boundary-straddling trio found each other across cells
    assert got[0][0] == "core" and got[0][1] == 0


def test_dbscan_chain_merges_through_shared_core(spark):
    # bridge topology: two blobs joined by a chain of core points must
    # come out as ONE cluster (the classic DBSCAN transitivity case)
    pts = {i: (float(i) * 0.9, 0.0) for i in range(8)}
    eps, min_pts = 1.0, 3
    got = _run(spark, pts, eps, min_pts)
    want = _ref_dbscan(pts, eps, min_pts)
    assert got == want
    labels = {v[1] for v in got.values() if v[1] is not None}
    # chain endpoints (0 and 7) have only 2 neighbors -> border; the
    # interior chain is one merged core cluster labeled by min core id 1
    assert labels == {1}
    assert got[0][0] == "border" and got[7][0] == "border"
    assert all(got[i] == ("core", 1) for i in range(1, 7))


def test_dbscan_rejects_nonpositive_eps(spark):
    with pytest.raises(ValueError):
        dbscan_grid(
            _pts_df(spark, {0: (0.0, 0.0)}), "pid", "x", "y", 0.0, 3
        )
