"""Wave-29 tests: bootstrap median brackets the true median,
containment profile accounting, entry/exit matrix accounting."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bootstrap_median_brackets_truth(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.stats_specs import (
        _REPL,
        poisson_bootstrap_median_ci,
    )
    from tests.conftest import SF_SMALL

    rows = poisson_bootstrap_median_ci(spark, SF_SMALL).collect()
    assert len(rows) == _REPL
    docs = load_table(spark, SF_SMALL, "documents")
    vals = sorted(r.n_chars for r in docs.collect())
    true_med = vals[len(vals) // 2]
    ests = sorted(r.median_est for r in rows)
    assert ests[0] <= true_med <= ests[-1]
    # determinism
    again = sorted(
        r.median_est for r in poisson_bootstrap_median_ci(spark, SF_SMALL).collect()
    )
    assert again == ests


def test_containment_profile_accounts_for_sample(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.stats_specs import containment_profile
    from tests.conftest import SF_SMALL

    rows = containment_profile(spark, SF_SMALL).collect()
    n_sample = (
        load_table(spark, SF_SMALL, "documents")
        .filter("doc_id % 5 = 0 AND doc_id < 1000 AND length(text) >= 3")
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_sample
    assert all(0 <= r.bucket <= 9 for r in rows)


def test_entry_exit_matrix_accounts_for_sessions(spark):
    from mcas_question2_etl_spark.plans.stats_specs import session_entry_exit_matrix
    from mcas_question2_etl_spark.plans.extensions import sessionize_events
    from tests.conftest import SF_SMALL

    matrix = session_entry_exit_matrix(spark, SF_SMALL).collect()
    n_sessions = sessionize_events(spark, SF_SMALL).count()
    assert sum(r.n_sessions for r in matrix) == n_sessions
    # single-event sessions must land on the diagonal, so the diagonal
    # is nonempty on sparse data
    assert any(r.entry_type == r.exit_type for r in matrix)
