"""Wave-27 tests: CDC apply semantics — tombstone suppression and
re-insert resurrection."""

from __future__ import annotations


def test_apply_cdc_tombstones_and_resurrection(spark):
    from mcas_question2_etl_spark.operators.upsert import apply_cdc

    changes = spark.createDataFrame(
        [
            # key 1: insert then delete -> absent
            (1, 1, "U", 10.0),
            (1, 2, "D", 0.0),
            # key 2: delete then re-insert -> present with new value
            (2, 1, "D", 0.0),
            (2, 2, "U", 42.0),
            # key 3: updates only -> latest value
            (3, 1, "U", 1.0),
            (3, 2, "U", 2.0),
        ],
        "k long, seq long, op string, v double",
    )
    rows = {r.k: r for r in apply_cdc(changes, ["k"], ["seq"]).collect()}
    assert 1 not in rows
    assert rows[2].v == 42.0
    assert rows[3].v == 2.0
    assert set(rows) == {2, 3}


def test_cdc_spec_accounts_for_all_users(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.curation_specs import cdc_apply_with_deletes
    from tests.conftest import SF_SMALL

    r = cdc_apply_with_deletes(spark, SF_SMALL).first()
    n_users = (
        load_table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert r.n_live + r.n_tombstoned == n_users
    assert r.n_live > 0 and r.n_tombstoned > 0
