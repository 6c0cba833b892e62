"""Wave 152 — Quade range-weighted block rank test.

Hand-pinned recomputation against the textbook definition (scipy-less,
pure python), the range-weighting property (a wide-range block
dominates the verdict where Friedman would tie), the
perfect-separation NULL contract, incomplete-block dropping, and
SQL-twin equality. Spec: quade_priority_revenue
(plans/stats_specs.py), gated in tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.evaluation import (
    quade_test,
    quade_test_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(b, t, float(v)) for b, t, v in rows],
        "b long, t long, v double",
    )


def _midranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        mid = (i + j) / 2 + 1
        for t in range(i, j + 1):
            ranks[order[t]] = mid
        i = j + 1
    return ranks


def _hand(rows):
    blocks: dict = {}
    for b, t, v in rows:
        blocks.setdefault(b, {})[t] = v
    k = max(len(d) for d in blocks.values())
    blocks = {b: d for b, d in blocks.items() if len(d) == k}
    n = len(blocks)
    treats = sorted(next(iter(blocks.values())).keys())
    bl = sorted(blocks)
    r = {
        b: dict(
            zip(treats, _midranks([blocks[b][t] for t in treats]))
        )
        for b in bl
    }
    rngs = [max(blocks[b].values()) - min(blocks[b].values()) for b in bl]
    q = dict(zip(bl, _midranks(rngs)))
    s = {
        (b, t): q[b] * (r[b][t] - (k + 1) / 2) for b in bl for t in treats
    }
    a = sum(v * v for v in s.values())
    sj = {t: sum(s[(b, t)] for b in bl) for t in treats}
    bb = sum(v * v for v in sj.values()) / n
    if a - bb <= 0:
        return n, k, None
    return n, k, (n - 1) * bb / (a - bb)


def test_hand_recomputation_with_ties(spark):
    rows = []
    for b in range(1, 9):
        for t in range(1, 5):
            rows.append((b, t, ((b * 7 + t * 13) % 11) * 0.5))
    r = quade_test(_df(spark, rows), "b", "t", "v").collect()[0]
    n, k, f = _hand(rows)
    assert (r.n_blocks, r.k_treatments) == (n, k)
    assert r.quade_f == pytest.approx(round(f, 6), abs=1e-6)


def test_range_weighting_dominant_block(spark):
    """One block with a huge range and a clear ordering should drive
    F far above what the same ordering in tiny-range blocks gives."""
    small = [(b, t, 10.0 + t * 0.01 * (1 if b % 2 else -1))
             for b in range(1, 7) for t in range(1, 4)]
    big = small + [(99, 1, 0.0), (99, 2, 500.0), (99, 3, 1000.0)]
    n0, k0, f0 = _hand(small)
    n1, k1, f1 = _hand(big)
    assert f0 == 0.0  # alternating blocks cancel exactly without weights
    r = quade_test(_df(spark, big), "b", "t", "v").collect()[0]
    assert r.n_blocks == 7
    # the wide-range block's consistent ordering pulls F off zero
    assert r.quade_f == pytest.approx(round(f1, 6), abs=1e-6)
    assert r.quade_f > 0.3


def test_perfect_separation_is_null(spark):
    """Every block ranks treatments identically AND ranges tie:
    A == B -> NULL F (no residual variance to test against)."""
    rows = [(b, t, float(t)) for b in range(1, 6) for t in range(1, 4)]
    r = quade_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.quade_f is None


def test_incomplete_blocks_dropped(spark):
    rows = [(b, t, float((b * t) % 7)) for b in range(1, 6) for t in (1, 2, 3)]
    rows.append((9, 1, 5.0))  # block 9 missing treatments 2,3
    r = quade_test(_df(spark, rows), "b", "t", "v").collect()[0]
    assert r.n_blocks == 5


def test_sql_twin_matches_spark_exactly(spark):
    rows = []
    for b in range(1, 13):
        for t in range(1, 6):
            rows.append((b, t, ((b * 17 + t * 29) % 23) * 0.25))
    r = quade_test(_df(spark, rows), "b", "t", "v").collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t0 (b BIGINT, t BIGINT, v DOUBLE)")
    con.executemany(
        "INSERT INTO t0 VALUES (?, ?, ?)",
        [(b, t, float(v)) for b, t, v in rows],
    )
    row = con.execute(
        quade_test_sql("SELECT * FROM t0", "b", "t", "v")
    ).fetchone()
    assert row == (r.n_blocks, r.k_treatments, r.quade_f)
