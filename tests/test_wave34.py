"""Wave-34 tests: HRW consistency property, emerging-terms sanity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _hrw_py(key: int, n_shards: int) -> int:
    best = None
    for s in range(n_shards):
        w = int(hashlib.md5(f"{key}#{s}".encode()).hexdigest()[:15], 16)
        if best is None or (w, s) > best:
            best = (w, s)
    return best[1]


def test_hrw_matches_python_and_is_consistent_on_growth(spark):
    """Spark assignment equals the python replay, and growing 16->17
    shards moves keys ONLY into the new shard (the consistent-hashing
    contract modulo bucketing breaks)."""
    from mcas_question2_etl_spark.plans.text_analytics import hrw_shard_expr

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    a16 = {
        r.doc_id: r.s
        for r in df.select("doc_id", hrw_shard_expr("doc_id", 16).alias("s")).collect()
    }
    a17 = {
        r.doc_id: r.s
        for r in df.select("doc_id", hrw_shard_expr("doc_id", 17).alias("s")).collect()
    }
    for k, s in a16.items():
        assert s == _hrw_py(k, 16)
    moved = [k for k in a16 if a16[k] != a17[k]]
    assert all(a17[k] == 16 for k in moved)  # only INTO the new shard
    # roughly 1/17 of keys move (binomial tolerance)
    assert 5 <= len(moved) <= 70


def test_emerging_terms_rise_ratio_consistent(spark):
    from mcas_question2_etl_spark.plans.text_analytics import (
        _SMOOTH,
        _TOP,
        emerging_terms_report,
    )
    from tests.conftest import SF_SMALL

    rows = emerging_terms_report(spark, SF_SMALL).collect()
    assert len(rows) == _TOP
    rises = [r.rise for r in rows]
    assert rises == sorted(rises, reverse=True)
    assert all(r.rise > 0 for r in rows)
