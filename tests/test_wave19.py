"""Unit tests for wave-19: chi-square vs scipy-free reference,
WindowGroupLimit plan assert, null-safe join row accounting."""

from __future__ import annotations

import pytest


def test_chi_square_matches_hand_computation(spark):
    """chi2 equals the textbook computation done driver-side from the
    same contingency table."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.stats_specs import chi_square_source_lang
    from tests.conftest import SF_SMALL

    got = chi_square_source_lang(spark, SF_SMALL).first()
    docs = load_table(spark, SF_SMALL, "documents")
    obs = {
        (r.source, r.lang): r.cnt
        for r in docs.groupBy("source", "lang").count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    sources = sorted({s for s, _ in obs})
    langs = sorted({l for _, l in obs})
    n = sum(obs.values())
    rt = {s: sum(v for (s2, _), v in obs.items() if s2 == s) for s in sources}
    ct = {l: sum(v for (_, l2), v in obs.items() if l2 == l) for l in langs}
    chi2 = sum(
        (obs.get((s, l), 0) - rt[s] * ct[l] / n) ** 2 / (rt[s] * ct[l] / n)
        for s in sources
        for l in langs
    )
    assert got.n_cells == len(sources) * len(langs)
    assert got.dof == (len(sources) - 1) * (len(langs) - 1)
    assert got.chi2 == pytest.approx(chi2, rel=1e-12)


def test_top_tokens_uses_window_group_limit(spark):
    """The rnk<=3 filter must plan as WindowGroupLimit (bounded
    per-partition heap), not a full sort-then-filter."""
    from mcas_question2_etl_spark.plans.stats_specs import top_tokens_per_source
    from tests.conftest import SF_SMALL

    df = top_tokens_per_source(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append((r.rnk, r.cnt))
    for src, got in per_source.items():
        got.sort()
        assert [rk for rk, _ in got] == list(range(1, len(got) + 1))
        cnts = [c for _, c in got]
        assert cnts == sorted(cnts, reverse=True)


def test_null_safe_join_accounts_for_every_row(spark):
    """eqNullSafe keeps NULL-keyed rows (they land in the null bucket);
    total joined rows == total left rows, and the null bucket holds
    exactly the multiples of 7."""
    from mcas_question2_etl_spark.catalog import load_table
    from mcas_question2_etl_spark.plans.stats_specs import null_safe_join_semantics
    from tests.conftest import SF_SMALL

    rows = {r.label: r for r in null_safe_join_semantics(spark, SF_SMALL).collect()}
    orders = load_table(spark, SF_SMALL, "orders")
    total = orders.count()
    n_mult7 = orders.filter("o_orderkey % 7 = 0").count()
    assert sum(r.n_rows for r in rows.values()) == total
    assert rows["null-bucket"].n_rows == n_mult7
