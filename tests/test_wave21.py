"""Unit tests for wave-21: survivorship policy, temperature
allocation math, lateness accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_canonicalize_by_picks_argmax(spark):
    """Hand-built components: survivor is the max-quality member, ties
    to the smallest id; singleton clusters survive as themselves."""
    from mcas_question2_etl_spark.operators.clustering import canonicalize_by

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (9, 7)], "doc_id long, q long"
    )
    rows = {r.cluster_id: r for r in canonicalize_by(comp, quality, "q").collect()}
    assert rows[1].survivor_id == 2  # q=50 tie -> smaller id
    assert rows[1].cluster_size == 3
    assert rows[1].best_quality == 50
    assert rows[9].survivor_id == 9
    assert rows[9].cluster_size == 1


def test_temperature_rates_allocation(spark):
    """alpha=1 reproduces natural shares; alpha=0.5 strictly raises the
    tail domain's share; rates clamp at 1 and are monotone in budget."""
    from mcas_question2_etl_spark.operators.sampling import temperature_rates

    df = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(i + 90, "small") for i in range(10)],
        "id long, dom string",
    )
    nat = {r.dom: r for r in temperature_rates(df, "dom", 1.0, 50).collect()}
    assert nat["big"].share == pytest.approx(0.9)
    assert nat["small"].share == pytest.approx(0.1)
    flat = {r.dom: r for r in temperature_rates(df, "dom", 0.5, 50).collect()}
    assert flat["small"].share > 0.1
    assert flat["big"].share < 0.9
    assert flat["small"].share + flat["big"].share == pytest.approx(1.0)
    huge = {r.dom: r for r in temperature_rates(df, "dom", 0.5, 10_000).collect()}
    assert huge["big"].rate == 1.0 and huge["small"].rate == 1.0


def test_temperature_sample_monotone_in_budget(spark):
    """Raising the budget only ADDS rows (hash membership is monotone)."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.operators.sampling import temperature_sample
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    small = {
        r.doc_id for r in temperature_sample(docs, "doc_id", "source", 0.5, 100).select("doc_id").collect()
    }
    big = {
        r.doc_id for r in temperature_sample(docs, "doc_id", "source", 0.5, 300).select("doc_id").collect()
    }
    assert small <= big


def test_late_arrival_buckets_cover_all_events(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.curation_specs import late_arrival_report
    from tests.conftest import SF_SMALL

    rows = late_arrival_report(spark, SF_SMALL).collect()
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF_SMALL, "events").count()
    labels = {r.lateness for r in rows}
    assert labels <= {"on-time", "lt-1m", "lt-1h", "lt-1d", "ge-1d"}
    assert "on-time" in labels
