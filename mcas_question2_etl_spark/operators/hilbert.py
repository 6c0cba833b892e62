"""Hilbert-curve layout keys: the locality-maximizing alternative to
Morton/Z-order (operators/zorder.py) for multi-dimensional file
clustering.

Z-order is cheap (bit interleave) but has "seams" — adjacent Z values
can be far apart in space, which widens per-file min/max envelopes and
weakens parquet stat pruning. The Hilbert curve (the layout Delta Lake
adopted as LIQUID clustering's default, and long used by e.g. Amazon
Redshift for multi-column sort keys) guarantees consecutive keys are
grid-ADJACENT cells, so range-partitioned files cover compact spatial
tiles. The per-row cost is a fixed ``order``-step bit fold — here a
single ``aggregate`` higher-order expression (whole-stage codegen, no
UDF, no shuffle), the same shape as the classic loop (Wikipedia
"Hilbert curve", xy2d, reflection with n-1 so coordinates stay
non-negative).

The Spark expression, the DuckDB twin (a recursive-CTE fold — see
``hilbert_oracle_sql`` for why not list_reduce), and the pure-Python
replay below implement the same recurrence, so the key is bit-identical
in all three —
the differential gate then proves the distributed fold against the
SQL fold, and pytest pins both against the Python loop plus the
defining curve properties (bijectivity + unit-step adjacency).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hilbert_key(x: str, y: str, order: int = 16) -> Column:
    """Hilbert d-index of (x, y) masked to ``order`` bits each, as one
    fold expression: state (x, y, d) threads through levels
    s = 2^(order-1) .. 1."""
    n = 1 << order
    mask = n - 1
    init = (
        f"named_struct('x', cast({x} as bigint) & {mask}L, "
        f"'y', cast({y} as bigint) & {mask}L, 'd', 0L)"
    )
    step = (
        "named_struct("
        # rx/ry for this level: s = shiftleft(1L, i)
        "'x', if(((a.y >> i) & 1L) = 0L, "
        f"if(((a.x >> i) & 1L) = 1L, {mask}L - a.y, a.y), a.x), "
        "'y', if(((a.y >> i) & 1L) = 0L, "
        f"if(((a.x >> i) & 1L) = 1L, {mask}L - a.x, a.x), a.y), "
        "'d', a.d + shiftleft(1L, i) * shiftleft(1L, i) * "
        "((3L * ((a.x >> i) & 1L)) ^ ((a.y >> i) & 1L)))"
    )
    return F.expr(
        f"aggregate(sequence({order - 1}, 0, -1), {init}, (a, i) -> {step}, "
        "a -> a.d)"
    )


def hilbert_oracle_sql(
    table: str,
    x: str,
    y: str,
    keep_cols: str,
    order: int = 16,
    key_alias: str = "hkey",
) -> str:
    """DuckDB twin of :func:`hilbert_key`: the identical recurrence as
    a recursive CTE (one iteration per level over the whole relation).

    A single-expression ``list_reduce`` fold would mirror Spark's
    ``aggregate`` more closely, but DuckDB 1.0 miscompiles this lambda:
    the fold applied level-by-level in separate queries gives the
    correct state while the same fold inside one list_reduce call
    diverges from level 4 on (verified against the pure-Python replay),
    so the oracle uses the lambda-free spelling. Returns a complete
    SELECT yielding (keep_cols, key_alias).
    """
    mask = (1 << order) - 1
    return f"""
    WITH RECURSIVE h AS (
      SELECT {keep_cols},
             CAST({x} AS BIGINT) & {mask} AS hx,
             CAST({y} AS BIGINT) & {mask} AS hy,
             CAST(0 AS BIGINT) AS hd,
             CAST({order - 1} AS BIGINT) AS i
      FROM {table}
      UNION ALL
      SELECT {keep_cols},
             CASE WHEN ((hy >> i) & 1) = 0 THEN
               (CASE WHEN ((hx >> i) & 1) = 1 THEN {mask} - hy ELSE hy END)
             ELSE hx END AS hx,
             CASE WHEN ((hy >> i) & 1) = 0 THEN
               (CASE WHEN ((hx >> i) & 1) = 1 THEN {mask} - hx ELSE hx END)
             ELSE hy END AS hy,
             hd + (1 << i) * (1 << i)
                * xor(3 * ((hx >> i) & 1), (hy >> i) & 1) AS hd,
             i - 1 AS i
      FROM h WHERE i >= 0
    )
    SELECT {keep_cols}, hd AS {key_alias} FROM h WHERE i = -1
    """


def hilbert_key_py(x: int, y: int, order: int = 16) -> int:
    """Pure-Python replay of the same recurrence (test pin)."""
    n = 1 << order
    mask = n - 1
    x &= mask
    y &= mask
    d = 0
    for i in range(order - 1, -1, -1):
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        d += (1 << i) * (1 << i) * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = mask - x, mask - y
            x, y = y, x
    return d


def hilbert_by(df, x: str, y: str, order: int = 16, num_files: int = 16):
    """Cluster ``df`` on the Hilbert key of (x, y) — drop-in upgrade of
    operators/zorder.zorder_by with the locality-optimal order (a box
    query touches ~2x fewer contiguous key runs; see tests). Same
    contract: range-partition + in-partition sort on the key, key
    column dropped, write with any parquet sink."""
    keyed = df.withColumn("__hkey", hilbert_key(x, y, order))
    return (
        keyed.repartitionByRange(num_files, "__hkey")
        .sortWithinPartitions("__hkey")
        .drop("__hkey")
    )
