"""Wave-99 hand pins: global Moran's I (queen contiguity) and
Getis-Ord Gi* hot spots. Both against plain-Python references on
small complete lattices, plus the defining poles: a perfect
checkerboard scores strongly negative I (dispersion), a blocked
half-split strongly positive (clustering), and a planted high block
must surface as the Gi* hot spot with the right z-scores.

Covered spec names: moran_i_customer_grid, getis_ord_hotspots.
"""

from __future__ import annotations

import numpy as np
import pytest

from mcas_question2_etl_spark.operators.spatial import (
    getis_ord_gstar,
    moran_i_queen,
)


def _cells_df(spark, grid):
    rows = [
        (i, j, int(grid[i][j]))
        for i in range(len(grid))
        for j in range(len(grid[0]))
    ]
    return spark.createDataFrame(rows, "ci long, cj long, x long")


def _neighbors(nr, nc, i, j, include_self):
    out = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if not include_self and di == 0 and dj == 0:
                continue
            a, b = i + di, j + dj
            if 0 <= a < nr and 0 <= b < nc:
                out.append((a, b))
    return out


def _moran_ref(grid):
    g = np.asarray(grid, dtype=float)
    nr, nc = g.shape
    n = nr * nc
    xbar = g.mean()
    num = 0.0
    w = 0
    degs = {}
    for i in range(nr):
        for j in range(nc):
            nbrs = _neighbors(nr, nc, i, j, False)
            degs[(i, j)] = len(nbrs)
            for a, b in nbrs:
                num += (g[i, j] - xbar) * (g[a, b] - xbar)
                w += 1
    den = ((g - xbar) ** 2).sum()
    i_stat = (n / w) * num / den
    e_i = -1.0 / (n - 1)
    s1 = 2.0 * w
    s2 = 4.0 * sum(d * d for d in degs.values())
    var = (n * n * s1 - n * s2 + 3.0 * w * w) / ((n * n - 1) * w * w) - (
        e_i * e_i
    )
    return i_stat, e_i, (i_stat - e_i) / np.sqrt(var), w


def _gstar_ref(grid):
    g = np.asarray(grid, dtype=float)
    nr, nc = g.shape
    n = nr * nc
    xbar = g.mean()
    s = np.sqrt((g * g).mean() - xbar * xbar)
    out = {}
    for i in range(nr):
        for j in range(nc):
            nbrs = _neighbors(nr, nc, i, j, True)
            wd = len(nbrs)
            xsum = sum(g[a, b] for a, b in nbrs)
            out[(i, j)] = (xsum - xbar * wd) / (
                s * np.sqrt((n * wd - wd * wd) / (n - 1.0))
            )
    return out


def test_moran_checkerboard_is_dispersed(spark):
    grid = [[(i + j) % 2 * 8 for j in range(8)] for i in range(8)]
    out = moran_i_queen(_cells_df(spark, grid)).collect()[0]
    i_ref, e_ref, z_ref, w = _moran_ref(grid)
    assert out.n_cells == 64
    assert out.w_sum == w
    assert out.moran_i == pytest.approx(i_ref, abs=1e-6)
    assert out.e_i == pytest.approx(e_ref, abs=1e-6)
    assert out.z_norm == pytest.approx(z_ref, abs=1e-5)
    # under QUEEN weights a checkerboard is only mildly dispersed
    # (diagonal neighbors share color and cancel the rook
    # disagreement), but it must sit on the dispersed side of E[I]
    assert out.moran_i < out.e_i
    assert out.z_norm < 0.0


def test_moran_blocked_halves_cluster(spark):
    grid = [[10 if j < 4 else 1 for j in range(8)] for i in range(8)]
    out = moran_i_queen(_cells_df(spark, grid)).collect()[0]
    i_ref, _, z_ref, _ = _moran_ref(grid)
    assert out.moran_i == pytest.approx(i_ref, abs=1e-6)
    assert out.moran_i > 0.5
    assert out.z_norm == pytest.approx(z_ref, abs=1e-5)
    assert out.z_norm > 2.0


def test_gstar_finds_planted_hotspot(spark):
    grid = [[1 for _ in range(10)] for _ in range(10)]
    for i, j in [(4, 4), (4, 5), (5, 4), (5, 5)]:
        grid[i][j] = 30
    out = getis_ord_gstar(_cells_df(spark, grid), top_k=4).collect()
    ref = _gstar_ref(grid)
    got = {(r.ci, r.cj) for r in out}
    assert got == {(4, 4), (4, 5), (5, 4), (5, 5)}
    for r in out:
        assert r.gi_star == pytest.approx(ref[(r.ci, r.cj)], abs=1e-6)
        assert r.gi_star > 2.0
        assert r.w_cells == 9


def test_gstar_edge_cells_smaller_blocks(spark):
    grid = [[int(3 * i + j) for j in range(5)] for i in range(5)]
    out = getis_ord_gstar(_cells_df(spark, grid), top_k=25).collect()
    ref = _gstar_ref(grid)
    by_cell = {(r.ci, r.cj): r for r in out}
    assert by_cell[(0, 0)].w_cells == 4
    assert by_cell[(0, 2)].w_cells == 6
    assert by_cell[(2, 2)].w_cells == 9
    for (i, j), r in by_cell.items():
        assert r.gi_star == pytest.approx(ref[(i, j)], abs=1e-6)
