#!/usr/bin/env python
"""EXACT cross-engine + cross-partitioning determinism probe.

Usage: python tools/exactcheck.py SPEC [SPEC...] [--sf SF_DIR] [--reps N]

Stricter than tools/diffcheck.py (which canonicalizes floats to 9
significant digits, absorbing the very ULP drift the driver's exact
value hash does NOT absorb — the r6 flap): this compares Spark vs the
DuckDB oracle at FULL double precision (repr/bit level), and re-runs
the Spark plan under several spark.sql.shuffle.partitions settings and
input repartitionings, asserting byte-identical results every time. A
spec passing here is bit-reproducible in the driver's sense.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def exact_canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full shortest-roundtrip precision
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v)
    except ImportError:
        pass
    return str(v)


def rows_of(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(exact_canon(r[c]) for c in cols) for r in df.collect()
    )


def duck_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(exact_canon(r[i]) for i in order) for r in cur.fetchall()
    )


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    reps = 3
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv

    from mcas_question2_etl_spark.session import get_spark
    from mcas_question2_etl_spark.plans.suite import SPECS
    from tests.oracle import duck_connection

    by_name = {s.name: s for s in SPECS}
    spark = get_spark()
    duck = duck_connection(sf_dir)
    bad = 0
    for name in names:
        spec = by_name[name]
        oracle = duck_rows(duck, spec.oracle) if spec.oracle else None
        seen = []
        for part in ("1", "7", "32", "61"):
            spark.conf.set("spark.sql.shuffle.partitions", part)
            for _ in range(reps):
                seen.append((part, rows_of(spec.fn(spark, sf_dir))))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        base = seen[0][1]
        det = all(r == base for _, r in seen)
        xeng = oracle is None or base == oracle
        status = "ok" if det and xeng else "FAIL"
        print(f"{name}: determinism={'ok' if det else 'FAIL'} "
              f"cross-engine={'ok' if xeng else 'FAIL'} -> {status}")
        if not det:
            for p, r in seen:
                if r != base:
                    print(f"  partitions={p}: {r[:2]} != {base[:2]}")
                    break
        if not xeng:
            print(f"  spark : {base[:3]}")
            print(f"  oracle: {oracle[:3]}")
        bad += 0 if status == "ok" else 1
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
