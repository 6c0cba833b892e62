"""Wave-25 tests: shard-manifest stability, LSH quality report
invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_shard_manifest_accounts_for_whole_corpus(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.curation_specs import shard_manifest
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    rows = shard_manifest(spark, SF_SMALL).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.total_chars for r in rows) == docs.agg(
        F.sum("n_chars")
    ).first()[0]
    assert all(0 <= r.shard < 16 for r in rows)


def test_shard_membership_stable_across_runs(spark):
    """Same corpus, same shard count -> identical manifests (the
    reproducible-export contract: no RNG, no partition sensitivity)."""
    from mcas_question2_etl_spark.plans.curation_specs import shard_manifest
    from tests.conftest import SF_SMALL

    a = sorted(map(tuple, shard_manifest(spark, SF_SMALL).collect()))
    b = sorted(
        map(
            tuple,
            shard_manifest(spark, SF_SMALL).repartition(7).collect(),
        )
    )
    assert a == b


def test_lsh_quality_report_invariants(spark):
    """tp <= min(truth, candidates); ratios consistent with counts; at
    the default banding the sampled recall is high (the pytest pin of
    the recall contract the spec reports)."""
    from mcas_question2_etl_spark.plans.curation_specs import lsh_quality_report
    from tests.conftest import SF_SMALL

    r = lsh_quality_report(spark, SF_SMALL).first()
    assert r.n_true_positives <= min(r.n_truth, r.n_candidates)
    assert r.precision == pytest.approx(r.n_true_positives / r.n_candidates)
    assert r.recall == pytest.approx(r.n_true_positives / r.n_truth)
    assert r.recall >= 0.8
