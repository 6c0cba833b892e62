"""Wave 118 — bit-reproducibility regression tests for the two specs
that flapped the round-6 driver gate (VERDICT r6 #1/#2).

`segmented_regression_daily` and `chow_break_daily` previously
accumulated y-moments as unordered double sums and rounded SSE/SSR
statistics of magnitude ~1e14 to 6 decimals — below double resolution,
so any partition-merge-order change flipped the value hash. Both now
accumulate every y-derived sum as exact DECIMAL (order-independent in
any engine) and report fit quality as dimensionless ratios.

These tests assert the driver-gate property directly: the output is
BYTE-IDENTICAL across >=5 runs spanning different
spark.sql.shuffle.partitions settings and input partition counts, and
exactly equal (full double precision, not the 9-sig-digit tolerance of
tests.oracle) to the DuckDB oracle.
"""

from __future__ import annotations

import math

import pytest

from mcas_question2_etl_spark.plans.suite import SPECS
from tests.conftest import SF_ORACLE
from tests.oracle import duck_connection

_BY_NAME = {s.name: s for s in SPECS}
_FIXED = [
    "segmented_regression_daily",
    "chow_break_daily",
    # r8 (VERDICT r7 #1/#2): outer k-row reduction made order-free
    # (sorted-group-key fold of the only double term) AND the extensive
    # outputs re-cut as intensive ones — ROUND(x,6) itself diverges
    # cross-engine above |x| ~ 2^53/1e6 even on bit-identical doubles.
    "anova_f_priority_price",
    "bartlett_priority_price",
    # r8 audit re-triage: extensive ROUNDed output re-cut as the CSR
    # ratio (ripley) / native percentile interpolation replaced with
    # exact-bigint order-statistic arithmetic (transition_latency)
    "ripley_k_suppliers",
    "transition_latency_profile",
]


def _exact(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(_exact(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _FIXED)
def test_bit_reproducible_across_partitionings(spark, name):
    """>=5 executions under varying shuffle-partition counts must
    produce byte-identical rows — the exact property the driver's
    value hash requires (tests.oracle's 9-sig-digit canon would hide
    the ULP drift this guards against)."""
    spec = _BY_NAME[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        runs = []
        for part in ("1", "5", "17", "32", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", part)
            runs.append(_rows(spec.fn(spark, SF_ORACLE)))
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        runs.append(_rows(spec.fn(spark, SF_ORACLE)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert all(r == runs[0] for r in runs[1:]), runs


@pytest.mark.parametrize("name", _FIXED)
def test_exact_cross_engine_match(spark, duck, name):
    """Spark output equals the DuckDB oracle at FULL double precision
    (repr-level), not just to 9 significant digits."""
    spec = _BY_NAME[name]
    cur = duck.execute(spec.oracle)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    oracle = sorted(
        tuple(_exact(r[i]) for i in order) for r in cur.fetchall()
    )
    assert _rows(spec.fn(spark, SF_ORACLE)) == oracle


#: columns allowed past the ROUND(x,6) magnitude bound because they
#: are UNROUNDED doubles with exact integer/DECIMAL provenance at
#: every level (bit-identical across engines by construction — the
#: corrected r8 audit rule; see PERF.md round-8 re-triage)
_EXACT_UNROUNDED = {
    "transition_latency_profile": {"p50_gap_us", "p90_gap_us"},
}


@pytest.mark.parametrize("name", _FIXED)
def test_outputs_are_rounding_safe_magnitudes(spark, name):
    """No ROUNDED double output column may carry |value| beyond
    2^53 * 10^-6 — the threshold past which ROUND(x, 6) is below
    double resolution and a single ULP of drift (or DuckDB's
    multiply-based ROUND alone) flips the driver hash (the r6/r8
    disease). Unrounded exact-provenance columns are exempt and
    listed explicitly."""
    spec = _BY_NAME[name]
    exempt = _EXACT_UNROUNDED.get(name, set())
    for row in spec.fn(spark, SF_ORACLE).collect():
        for k, v in row.asDict().items():
            if isinstance(v, float) and k not in exempt:
                assert abs(v) < 2.0**53 * 1e-6, (k, v)
