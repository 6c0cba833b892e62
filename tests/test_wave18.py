"""Unit tests for wave-18: layout probe invariants, PSI properties,
MRL prefix recall bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_hilbert_pruning_probe_invariants(spark):
    """Both layouts cover the same data: equal matching rows, equal
    total rows across buckets, and scanned >= matching (envelope
    pruning can only over-approximate)."""
    from mcas_question2_etl_spark.plans.curation_specs import hilbert_pruning_stats
    from tests.conftest import SF_SMALL

    rows = {r.layout: r for r in hilbert_pruning_stats(spark, SF_SMALL).collect()}
    assert set(rows) == {"hilbert", "zorder"}
    h, z = rows["hilbert"], rows["zorder"]
    assert h.rows_matching == z.rows_matching > 0
    assert h.rows_scanned >= h.rows_matching
    assert z.rows_scanned >= z.rows_matching
    assert h.n_buckets_hit <= h.n_buckets
    assert z.n_buckets_hit <= z.n_buckets


def test_psi_nonnegative_and_zero_on_identical(spark):
    """PSI terms (p-q)ln(p/q) are sign-matched, so PSI >= 0 always;
    a single-source corpus is identical to the global distribution,
    so its PSI is exactly 0."""
    from mcas_question2_etl_spark.plans.curation_specs import psi_source_drift
    from tests.conftest import SF_SMALL

    rows = psi_source_drift(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.psi >= 0.0

    one = spark.createDataFrame(
        [(i, "only", 100 + i * 7) for i in range(50)],
        "doc_id long, source string, n_chars long",
    )
    import mcas_question2_etl_spark.plans.curation_specs as w18
    from mcas_question2_etl_spark.catalog import load_table

    # route the plan over a single-source relation by monkeypatching the
    # loader input shape: call the underlying logic directly
    docs = one
    binned = docs.select("source", F.expr(w18._PSI_BIN_SPARK).alias("bin"))
    per_source = binned.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c"))
    src_tot = per_source.groupBy("source").agg(F.sum("c").alias("n"))
    glob = per_source.groupBy("bin").agg(F.sum("c").alias("g"))
    glob_tot = per_source.agg(F.sum("c").alias("m"))
    grid = (
        per_source.select("source").distinct()
        .crossJoin(per_source.select("bin").distinct())
        .join(per_source, ["source", "bin"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    terms = (
        grid.join(src_tot, "source")
        .join(glob, "bin")
        .crossJoin(glob_tot)
        .select(
            "source",
            ((F.col("c") + 1).cast("double") / (F.col("n") + w18._N_BINS)).alias("p"),
            ((F.col("g") + 1).cast("double") / (F.col("m") + w18._N_BINS)).alias("q"),
        )
    )
    psi = terms.groupBy("source").agg(
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi")
    ).first().psi
    assert psi == pytest.approx(0.0, abs=1e-12)


def test_mrl_recall_bounds(spark):
    from mcas_question2_etl_spark.plans.curation_specs import (
        _MRL_K,
        _MRL_QUERIES,
        mrl_prefix_recall,
    )
    from tests.conftest import SF_SMALL

    rows = mrl_prefix_recall(spark, SF_SMALL).collect()
    assert sorted(r.qid for r in rows) == sorted(_MRL_QUERIES)
    for r in rows:
        assert 0 <= r.n_common <= _MRL_K
        assert r.k == _MRL_K
