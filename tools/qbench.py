#!/usr/bin/env python
"""Isolated per-query micro-bench: fresh JVM, same methodology as
bench.py (table warmup, one plan warmup, then timed noop runs).

Usage: python tools/qbench.py SPEC [SPEC...] [--sf SF_DIR] [--runs N]
                              [--explain DIR] [--suffix TAG]

With --explain DIR, also writes DIR/<spec>_<TAG>.txt containing
``.explain("formatted")`` for each spec (TAG defaults to "plan").
Prints one line per spec: name, warmup seconds, then each timed run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    args = sys.argv[1:]

    def _opt(flag, default=None):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = _opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    runs = int(_opt("--runs", "3"))
    explain_dir = _opt("--explain")
    suffix = _opt("--suffix", "plan")
    names = args
    if not names:
        print("usage: qbench.py SPEC [SPEC...]", file=sys.stderr)
        return 2

    from mcas_question2_etl_spark.plans.suite import SPECS
    from mcas_question2_etl_spark.session import get_spark
    from mcas_question2_etl_spark.catalog import TABLES, load_table

    specs = {s.name: s for s in SPECS}
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown specs: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark(app_name="qbench")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    for name in names:
        fn = specs[name].fn
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
        spark.sparkContext.setJobDescription(f"qbench:{name}:warmup")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"qbench:{name}:run{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: warm={warm:.2f}s runs="
            + ",".join(f"{t:.2f}" for t in times),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
