"""Unit/property tests for wave-17: Hilbert curve keys and
Fellegi-Sunter linkage scoring."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_hilbert_properties_small_grid():
    """Pure-Python replay satisfies the curve's defining properties on
    a full 32x32 grid: bijective onto [0, 1024) and consecutive keys
    are grid-adjacent (manhattan distance exactly 1)."""
    from mcas_question2_etl_spark.operators.hilbert import hilbert_key_py

    order = 5
    n = 1 << order
    pos = {}
    for x in range(n):
        for y in range(n):
            pos[hilbert_key_py(x, y, order)] = (x, y)
    assert len(pos) == n * n
    assert sorted(pos) == list(range(n * n))
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = pos[d], pos[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_spark_matches_python(spark):
    from mcas_question2_etl_spark.operators.hilbert import (
        hilbert_key,
        hilbert_key_py,
    )

    rng = random.Random(9)
    rows = [
        (i, rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r.id: r.k
        for r in df.select("id", hilbert_key("x", "y", 16).alias("k")).collect()
    }
    for i, x, y in rows:
        assert got[i] == hilbert_key_py(x, y, 16)


def test_hilbert_locality_beats_morton_on_box_query():
    """The payoff claim (Moon et al. 2001, the clustering theorem): a
    box query touches FEWER contiguous key runs ("clusters") under
    Hilbert than under Morton on average — each run is one contiguous
    key range, i.e. one file-range seek in a range-partitioned layout."""
    from mcas_question2_etl_spark.operators.hilbert import hilbert_key_py
    from mcas_question2_etl_spark.operators.zorder import morton_key_py

    def runs(keys):
        ks = sorted(keys)
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b > a + 1)

    rng = random.Random(4)
    h_runs = m_runs = 0
    for _ in range(40):
        x0 = rng.randrange(0, (1 << 10) - 8)
        y0 = rng.randrange(0, (1 << 10) - 8)
        cells = [(x0 + i, y0 + j) for i in range(8) for j in range(8)]
        h_runs += runs(hilbert_key_py(x, y, 10) for x, y in cells)
        m_runs += runs(morton_key_py(x, y, 10) for x, y in cells)
    assert h_runs < m_runs


def test_fellegi_sunter_score_bounds(spark):
    """Every candidate scores within the analytic weight bounds and the
    match verdict matches a re-computed threshold test."""
    from mcas_question2_etl_spark.plans.curation_specs import (
        _MATCH_T,
        fellegi_sunter_linkage,
    )
    from tests.conftest import SF_SMALL

    rows = fellegi_sunter_linkage(spark, SF_SMALL).collect()
    assert rows
    lo = 25 - 5 - 3 - 2
    hi = 40 + 15 + 10 + 8
    for r in rows:
        assert lo <= r.score <= hi
        assert r.is_match == (r.score >= _MATCH_T)
        assert r.n_pairs > 0
