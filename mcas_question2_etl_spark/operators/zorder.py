"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

The reference's only layout concept is the per-county partition
(election_results_etl.py:142-163, SURVEY §1.3). At 100 TB a single
partition column is not enough: queries filter on several dimensions
(date AND customer, lat AND lon), and hash or single-column-range
layouts can prune on at most one of them. Interleaving the bits of two
bounded dimensions into one Morton key and range-partitioning + sorting
files by that key makes every file's min/max footprint a small *tile* in
(x, y) space, so parquet column statistics prune a 2-D box predicate to
the handful of files whose tiles intersect it — the same trick Delta
Lake's OPTIMIZE ZORDER BY applies.

Everything here is closed-form bit arithmetic (shiftleft / & / |), pure
whole-stage-codegen expressions — no UDF, no shuffle beyond the single
repartitionByRange that any clustering rewrite needs. The SQL spelling
of the identical expression is generated from the same loop so a
differential oracle can verify the key math bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints.

    Bit i of x lands at position 2i, bit i of y at 2i+1 — the standard
    Morton / Z-curve code. Inputs are masked to ``bits`` bits first so
    out-of-range values wrap instead of colliding across tiles.
    """
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def morton_key_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as portable SQL (for a DuckDB oracle)."""
    mask = (1 << bits) - 1
    xm = f"(CAST({x} AS BIGINT) & {mask})"
    ym = f"(CAST({y} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def morton_key_py(x: int, y: int, bits: int = 16) -> int:
    """Pure-Python reference implementation (property tests)."""
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    key = 0
    for i in range(bits):
        key |= ((x >> i) & 1) << (2 * i)
        key |= ((y >> i) & 1) << (2 * i + 1)
    return key


def morton_decode_py(key: int, bits: int = 16) -> tuple[int, int]:
    """Inverse of :func:`morton_key_py` (round-trip property tests)."""
    x = y = 0
    for i in range(bits):
        x |= ((key >> (2 * i)) & 1) << i
        y |= ((key >> (2 * i + 1)) & 1) << i
    return x, y


def zorder_by(
    df: DataFrame, x: str, y: str, bits: int = 16, num_files: int = 16
) -> DataFrame:
    """Cluster ``df`` on the Morton key of (x, y) for 2-D file pruning.

    ``repartitionByRange`` on the key gives each output file a compact
    Z-curve interval (a union of few tiles); ``sortWithinPartitions``
    tightens per-row-group min/max stats. Write the result with any
    parquet sink and box predicates on (x, y) prune at both file and
    row-group granularity.

    The helper column is dropped before returning rows to keep the
    user-visible schema unchanged; Catalyst keeps the ordering.
    """
    keyed = df.withColumn("__zkey", morton_key(F.col(x), F.col(y), bits))
    return (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
