"""Wave-36 tests: in-place dedup semantics, autocorrelation sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_inplace_dedup_preserves_first_occurrence_order(spark):
    df = spark.createDataFrame(
        [(1, "a b a c b a")], "doc_id long, text string"
    )
    toked = df.select(F.split("text", " ").alias("ts"))
    kept = toked.select(
        F.expr("filter(ts, (t, i) -> array_position(ts, t) = i + 1)").alias("k")
    ).first()
    assert kept.k == ["a", "b", "c"]  # order preserved, repeats dropped


def test_inplace_dedup_accounting(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.text_analytics import inplace_token_dedup
    from tests.conftest import SF_SMALL

    rows = inplace_token_dedup(spark, SF_SMALL).collect()
    total_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_docs for r in rows) == total_docs
    for r in rows:
        assert r.tokens_after <= r.tokens_before
        assert r.tokens_removed == r.tokens_before - r.tokens_after
        # word-soup corpus: heavy repetition, so dedup must remove a lot
        assert r.tokens_removed > 0


def test_autocorrelation_bounds_and_coverage(spark):
    from mcas_question2_etl_spark.plans.text_analytics import (
        _AC_LAGS,
        autocorrelation_report,
    )
    from tests.conftest import SF_SMALL

    rows = autocorrelation_report(spark, SF_SMALL).collect()
    lags = {(r.event_type, r.lag) for r in rows}
    types = {r.event_type for r in rows}
    assert all((t, l) in lags for t in types for l in _AC_LAGS)
    for r in rows:
        assert -1 - 1e-9 <= r.acf <= 1 + 1e-9
        assert r.n_days > 0
