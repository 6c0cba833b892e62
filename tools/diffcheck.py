#!/usr/bin/env python
"""Run the driver's differential gate locally at an arbitrary sf.

Usage: python tools/diffcheck.py [sf_dir] [first_n]

Mirrors the driver exactly: for each spec in graded order, run the
Spark plan and the DuckDB oracle on the same parquet dir and compare
rows/schema/value-hash via tests.oracle.compare. Prints one line per
spec and a failure summary; exit code 1 if any spec mismatches.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from mcas_question2_etl_spark.session import get_spark
    from mcas_question2_etl_spark.plans.suite import SPECS
    from tests.oracle import compare, duck_connection

    spark = get_spark()
    duck = duck_connection(sf_dir)
    specs = SPECS[:first_n] if first_n else SPECS
    failures: list[tuple[str, list[str]]] = []
    t0 = time.time()
    for i, spec in enumerate(specs):
        t = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"[{i + 1}/{len(specs)}] {spec.name}: rows-only ({n}) "
                      f"{time.time() - t:.1f}s", flush=True)
                continue
            problems = compare(df, duck, spec.oracle)
        except Exception as exc:  # noqa: BLE001 — report, keep going
            problems = [f"EXCEPTION: {exc!r}"]
        status = "ok" if not problems else "FAIL"
        print(f"[{i + 1}/{len(specs)}] {spec.name}: {status} "
              f"{time.time() - t:.1f}s", flush=True)
        if problems:
            failures.append((spec.name, problems))
    print(f"\ntotal {time.time() - t0:.0f}s; {len(failures)} failures")
    for name, probs in failures:
        print(f"  {name}:")
        for p in probs[:5]:
            print(f"    {p}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
