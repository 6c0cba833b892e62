"""Wave 154 — bench-scale overflow guard for the rank-test family.

The r8 sf0.1 bench caught an ANSI long overflow the sf0.001/sf0.01
gates could not: lepage's Ansari-Bradley total sa_tot grows ~N²/4, so
sa_tot² blows past int64 once N ≳ 1.1e5 rows — exactly the class of
bug that only appears at scale. This test runs every rank-family spec
whose accumulators grow superlinearly in N directly at sf0.1
(~3.6e5 input rows) against its DuckDB oracle, exact-match, so any
future accumulator regression fails HERE instead of in the driver's
bench. Skips cleanly if the sf0.1 testdata is absent.
"""

from __future__ import annotations

import math
import os

import pytest

from mcas_question2_etl_spark.plans.suite import SPECS
from tests.oracle import duck_connection

SF_BIG = "/root/testdata/sf0.1"

_SUPERLINEAR_RANK_SPECS = [
    "lepage_price_returnflag",      # sa_tot² ~ N⁴/16 — the r8 bug
    "cucconi_price_returnflag",     # u4/v4 ~ 4N³
    "mood_scale_price_returnflag",  # t4/ss4 ~ 4N³
    "quade_priority_revenue",       # s4j² quadratic accumulators
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_BIG), reason="sf0.1 testdata not present"
)


def _exact(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


@pytest.fixture(scope="module")
def duck_big():
    con = duck_connection(SF_BIG)
    yield con
    con.close()


@pytest.mark.parametrize("name", _SUPERLINEAR_RANK_SPECS)
def test_rank_spec_survives_bench_scale(spark, duck_big, name):
    spec = {s.name: s for s in SPECS}[name]
    df = spec.fn(spark, SF_BIG)
    cols = sorted(df.columns)
    srows = sorted(
        tuple(_exact(r[c]) for c in cols) for r in df.collect()
    )
    cur = duck_big.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    order = sorted(range(len(ocols)), key=lambda i: ocols[i])
    orows = sorted(
        tuple(_exact(r[i]) for i in order) for r in cur.fetchall()
    )
    assert srows == orows
