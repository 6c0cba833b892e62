"""Wave-26 tests: epoch permutation properties, shared-opening
provenance sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_epoch_permutations_differ_and_are_stable(spark):
    from mcas_question2_etl_spark.plans.curation_specs import epoch_shuffle_order
    from tests.conftest import SF_SMALL

    rows = {r.epoch: r for r in epoch_shuffle_order(spark, SF_SMALL).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].n_docs == rows[1].n_docs > 0
    # different epochs -> different permutations
    assert rows[0].perm_checksum != rows[1].perm_checksum
    # identical re-run -> identical checksums (determinism)
    again = {r.epoch: r for r in epoch_shuffle_order(spark, SF_SMALL).collect()}
    assert {e: r.perm_checksum for e, r in rows.items()} == {
        e: r.perm_checksum for e, r in again.items()
    }


def test_epoch_checksum_matches_driver_replay(spark):
    """The position-weighted checksum equals a pure-Python replay of
    the same md5 ordering on one epoch."""
    import hashlib

    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.curation_specs import epoch_shuffle_order
    from tests.conftest import SF_SMALL

    ids = [
        r.doc_id for r in load_table(spark, SF_SMALL, "documents").select("doc_id").collect()
    ]
    order = sorted(ids, key=lambda d: hashlib.md5(f"{d}#0".encode()).hexdigest())
    want = sum(d * (i + 1) for i, d in enumerate(order))
    got = {r.epoch: r for r in epoch_shuffle_order(spark, SF_SMALL).collect()}
    assert got[0].perm_checksum == want
    assert got[0].first_doc == order[0]


def test_shared_openings_symmetric_and_positive(spark):
    from mcas_question2_etl_spark.plans.curation_specs import (
        cross_source_shared_openings,
    )
    from tests.conftest import SF_SMALL

    rows = cross_source_shared_openings(spark, SF_SMALL).collect()
    for r in rows:
        assert r.source_x < r.source_y  # canonical unordered pair
        assert r.n_dup_pairs > 0
