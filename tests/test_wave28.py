"""Wave-28 tests: KS statistic pinned against scipy-free reference."""

from __future__ import annotations

import pytest


def test_ks_matches_driver_replay(spark):
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.stats_specs import ks_test_sources
    from tests.conftest import SF_SMALL

    got = ks_test_sources(spark, SF_SMALL).first()
    docs = load_table(spark, SF_SMALL, "documents")
    a = sorted(
        r.n_chars for r in docs.filter("source = 'src0'").collect()
    )
    b = sorted(
        r.n_chars for r in docs.filter("source = 'src1'").collect()
    )
    support = sorted(set(a) | set(b))
    import bisect

    best, at = 0.0, None
    for v in support:
        d = abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        if d > best:
            best, at = d, v
    assert got.n_a == len(a) and got.n_b == len(b)
    assert got.ks_stat == pytest.approx(best)
    assert got.ks_at_value == at
    assert 0.0 <= got.ks_stat <= 1.0


def test_ks_zero_on_identical_samples(spark):
    """Same values in both groups -> KS exactly 0."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [("a", v) for v in (1, 2, 3, 3, 7)] + [
        ("b", v) for v in (1, 2, 3, 3, 7)
    ]
    df = spark.createDataFrame(rows, "source string, v long")
    per_v = df.groupBy("v").agg(
        F.sum((F.col("source") == "a").cast("long")).alias("ca"),
        F.sum((F.col("source") == "b").cast("long")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ks = (
        per_v.select(
            (F.sum("ca").over(w) / 5.0 - F.sum("cb").over(w) / 5.0).alias("d")
        )
        .agg(F.max(F.abs("d")))
        .first()[0]
    )
    assert ks == 0.0
