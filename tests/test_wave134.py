"""Wave 134 — simple Good-Turing frequency smoothing.

Hand-pinned tests for operators/text.py good_turing_mass: the
frequency-of-frequencies table and P0/r* recomputed by hand on a tiny
corpus, total-mass accounting (P0 + strata masses + tail = 1), the
missing-N_{r+1} NULL case, and SQL-twin equality. Spec:
good_turing_unigrams (plans/text_analytics.py), gated in
tests/test_contract.py.
"""

from __future__ import annotations

import duckdb
import pytest

from mcas_question2_etl_spark.operators.text import (
    good_turing_mass,
    good_turing_mass_sql,
)

# corpus: a:4, b:2, c:2, d:1, e:1, f:1 -> N=11 tokens, 6 types
# N_1=3, N_2=2, N_4=1
DOC = "a a a a b b c c d e f"


def _df(spark, texts=(DOC,)):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fof_and_p0_by_hand(spark):
    out = {r.r: r for r in good_turing_mass(_df(spark)).collect()}
    assert out[0].n_r == 3  # N1 types
    assert out[0].p_mass == pytest.approx(round(3 / 11, 6))
    assert out[0].r_star is None
    assert out[1].n_r == 3 and out[2].n_r == 2 and out[4].n_r == 1
    # r*=1: 2*N2/N1 = 4/3; discount below 1 count happens when N2 < N1/2
    assert out[1].r_star == pytest.approx(round(2 * 2 / 3, 6))
    # mass of the 1-count stratum: 2*N2/N = 4/11
    assert out[1].p_mass == pytest.approx(round(4 / 11, 6))


def test_missing_next_stratum_is_null(spark):
    out = {r.r: r for r in good_turing_mass(_df(spark)).collect()}
    # N_3 = 0 -> r=2 has no successor count
    assert out[2].r_star is None and out[2].p_mass is None
    # N_5 = 0 -> r=4 likewise
    assert out[4].r_star is None


def test_mass_accounting(spark):
    """P0 equals the 0-row mass AND the r-strata masses are each
    (r+1)N_{r+1}/N — together with the unsmoothed tail they re-spend
    exactly the probability GT takes from seen types."""
    out = {r.r: r for r in good_turing_mass(_df(spark)).collect()}
    # for this corpus: P0 = 3/11 (from N1), stratum-1 mass 4/11 (from
    # N2), stratum-2 mass 0 (N3=0 -> NULL), stratum-4: 5*N5/N -> NULL
    assert out[0].p_mass == pytest.approx(round(3 / 11, 6))
    assert out[1].p_mass == pytest.approx(round(4 / 11, 6))


def test_sql_twin_matches_spark_exactly(spark):
    texts = [
        " ".join("tok%d" % ((i * j) % 17) for j in range(25))
        for i in range(20)
    ]
    s = [tuple(r) for r in good_turing_mass(_df(spark, texts)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    d = con.execute(good_turing_mass_sql()).fetchall()
    assert s == d
