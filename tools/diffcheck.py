#!/usr/bin/env python
"""Run the driver's differential gate locally at an arbitrary sf.

Usage: python tools/diffcheck.py [sf_dir] [first_n] [--json OUT.json]

Mirrors the driver exactly: for each spec in graded order, run the
Spark plan and the DuckDB oracle on the same parquet dir and compare
rows/schema/value-hash via tests.oracle.compare. Prints one line per
spec and a failure summary; exit code 1 if any spec mismatches.

With --json, also writes a driver-artifact-shaped per-spec map
{name: {"status": "ok"|"rows-only"|"FAIL", "seconds": t, ...}} so a
full-suite run can be committed as CORRECTNESS_FULL_r{N}.json
(VERDICT r3 #1: put every spec inside an auditable sf0.01 artifact).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--json"]
    json_out = None
    if "--json" in sys.argv:
        idx = sys.argv.index("--json")
        json_out = sys.argv[idx + 1]
        args = [a for a in sys.argv[1:] if a not in ("--json", json_out)]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    first_n = int(args[1]) if len(args) > 1 else 0

    from mcas_question2_etl_spark.session import get_spark
    from mcas_question2_etl_spark.plans.suite import SPECS
    from tests.oracle import compare, duck_connection

    spark = get_spark()
    duck = duck_connection(sf_dir)
    specs = SPECS[:first_n] if first_n else SPECS
    failures: list[tuple[str, list[str]]] = []
    results: dict[str, dict] = {}
    t0 = time.time()
    for i, spec in enumerate(specs):
        t = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"[{i + 1}/{len(specs)}] {spec.name}: rows-only ({n}) "
                      f"{time.time() - t:.1f}s", flush=True)
                results[spec.name] = {
                    "status": "rows-only",
                    "rows": n,
                    "seconds": round(time.time() - t, 2),
                }
                continue
            problems = compare(df, duck, spec.oracle)
        except Exception as exc:  # noqa: BLE001 — report, keep going
            problems = [f"EXCEPTION: {exc!r}"]
        status = "ok" if not problems else "FAIL"
        print(f"[{i + 1}/{len(specs)}] {spec.name}: {status} "
              f"{time.time() - t:.1f}s", flush=True)
        results[spec.name] = {
            "status": status,
            "seconds": round(time.time() - t, 2),
        }
        if problems:
            results[spec.name]["problems"] = problems[:5]
            failures.append((spec.name, problems))
    if json_out:
        import json as _json

        n_ok = sum(1 for r in results.values() if r["status"] == "ok")
        n_ro = sum(1 for r in results.values() if r["status"] == "rows-only")
        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "specs_total": len(results),
                    "hash_match": n_ok,
                    "rows_only": n_ro,
                    "failures": len(failures),
                    "total_seconds": round(time.time() - t0, 1),
                    "specs": results,
                },
                f,
                indent=1,
            )
    print(f"\ntotal {time.time() - t0:.0f}s; {len(failures)} failures")
    for name, probs in failures:
        print(f"  {name}:")
        for p in probs[:5]:
            print(f"    {p}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
