"""Wave-33 tests: IPF margins converge toward targets and preserve
total mass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ipf_margins_converge(spark):
    from mcas_question2_etl_spark.operators.raking import ipf_fit_uniform

    cells = spark.createDataFrame(
        [
            ("r1", "c1", 10),
            ("r1", "c2", 1),
            ("r2", "c1", 5),
            ("r2", "c2", 20),
            ("r3", "c1", 2),
            ("r3", "c2", 2),
        ],
        "r string, c string, w long",
    )
    fitted = ipf_fit_uniform(cells, "r", "c", "w", iters=12)
    tot = 40.0
    rows = {r.r: r for r in fitted.groupBy("r").agg(F.sum("fitted").alias("s")).collect()}
    cols = {r.c: r for r in fitted.groupBy("c").agg(F.sum("fitted").alias("s")).collect()}
    for r in rows.values():
        assert r.s == pytest.approx(tot / 3, rel=1e-6)
    for c in cols.values():
        assert c.s == pytest.approx(tot / 2, rel=1e-6)
    total = fitted.agg(F.sum("fitted")).first()[0]
    assert total == pytest.approx(tot, rel=1e-9)


def test_ipf_spec_mass_and_positivity(spark):
    from mcas_question2_etl_spark.plans.stats_specs import ipf_raking_weights
    from mcas_question2_etl_spark.catalog import load_table
    from tests.conftest import SF_SMALL

    fitted = ipf_raking_weights(spark, SF_SMALL)
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    total = fitted.agg(F.sum("fitted")).first()[0]
    assert total == pytest.approx(n_docs, rel=1e-9)
    assert fitted.filter("fitted <= 0").count() == 0
