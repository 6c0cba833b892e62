"""Skyline (Pareto-front) query operator — the multi-criteria
"best suppliers" question no single ORDER BY can answer: return every
row NOT DOMINATED by another (dominated = someone is at least as good
on every criterion and strictly better on one). Börzsönyi/Kossmann/
Stocker (ICDE 2001) introduced it as a first-class operator; engines
still mostly lack it.

Exactness discipline (wave 118): criteria are exact integer totals or
RATIONALS of integer totals (averages, rates); rational criteria are
compared by CROSS-MULTIPLICATION (``a1*n2 <= a2*n1``), so dominance is
pure integer arithmetic — no float boundary can flip a skyline
membership between engines or partitionings.

Scale shape: the dominance test is a self-join over the CANDIDATE
table, which must be a bounded rollup (suppliers, brands, days — dims,
never fact rows) — the same bounded-kernel contract as
mann_kendall/pettitt. For candidate sets beyond broadcast size the
standard refinement is sort-filter-skyline (pre-sort by one criterion
so each row only checks earlier rows); not needed at dim cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline(
    df: DataFrame,
    key_col: str,
    criteria: Sequence[tuple[str, str]],
) -> DataFrame:
    """Skyline of ``df`` under ``criteria``: a list of
    ``(num_col, den_col)`` pairs, each a MINIMIZED rational
    ``num/den`` with integer columns (pass den = a literal-1 column
    for plain integer criteria; negate a num to maximize). Returns the
    non-dominated rows (key + all criterion columns), ordered by key.

    Dominance (t over s): for every criterion
    ``t.num * s.den <= s.num * t.den`` and strictly ``<`` for at least
    one — all exact bigint products.
    """
    cols = [key_col] + [c for pair in criteria for c in pair]
    base = df.select(*dict.fromkeys(cols)).localCheckpoint(eager=False)
    a = base.select(
        [F.col(key_col).alias("__k")]
        + [
            F.col(c).alias(f"__a{i}_{j}")
            for i, pair in enumerate(criteria)
            for j, c in enumerate(pair)
        ]
    )
    b = base.select(
        [F.col(key_col).alias("__k2")]
        + [
            F.col(c).alias(f"__b{i}_{j}")
            for i, pair in enumerate(criteria)
            for j, c in enumerate(pair)
        ]
    )
    leq = None
    lt = None
    for i in range(len(criteria)):
        # t(=b) at-least-as-good / strictly-better than s(=a):
        # b_num * a_den <= a_num * b_den  (dens positive)
        c_leq = (
            F.col(f"__b{i}_0") * F.col(f"__a{i}_1")
            <= F.col(f"__a{i}_0") * F.col(f"__b{i}_1")
        )
        c_lt = (
            F.col(f"__b{i}_0") * F.col(f"__a{i}_1")
            < F.col(f"__a{i}_0") * F.col(f"__b{i}_1")
        )
        leq = c_leq if leq is None else (leq & c_leq)
        lt = c_lt if lt is None else (lt | c_lt)
    dominated = (
        a.join(b, (F.col("__k") != F.col("__k2")) & leq & lt, "leftsemi")
        .select("__k")
    )
    return (
        base.join(
            dominated.withColumnRenamed("__k", key_col), key_col, "leftanti"
        )
        .orderBy(key_col)
    )


def skyline_sql(
    src_sql: str,
    key_col: str,
    criteria: Sequence[tuple[str, str]],
) -> str:
    """DuckDB twin of :func:`skyline` (same cross-multiplied integer
    dominance)."""
    leq = " AND ".join(
        f"(t.{n} * s.{d} <= s.{n} * t.{d})" for n, d in criteria
    )
    lt = " OR ".join(
        f"(t.{n} * s.{d} < s.{n} * t.{d})" for n, d in criteria
    )
    cols = ", ".join(
        dict.fromkeys(
            [key_col] + [c for pair in criteria for c in pair]
        )
    )
    return f"""
    WITH base AS (SELECT {cols} FROM ({src_sql}) q)
    SELECT * FROM base s
    WHERE NOT EXISTS (
      SELECT 1 FROM base t
      WHERE t.{key_col} <> s.{key_col} AND {leq} AND ({lt})
    )
    ORDER BY {key_col}
    """
