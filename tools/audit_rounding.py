#!/usr/bin/env python
"""Rounding-magnitude audit over every oracle-backed spec (VERDICT r6 #3).

The r6 driver-gate flaps came from ROUND(x, k) applied to doubles whose
magnitude exceeds 2^53 * 10^-k: past that point the double's ULP is
larger than the rounding granularity, so ANY order-dependent drift in
an upstream unordered double sum flips the rounded value (and the
driver hash). This tool runs each spec's DuckDB oracle at a given sf
and reports every DOUBLE output column whose max |value| crosses the
threshold for k=6 (the suite-wide default round_to), i.e. 9.007e9.

Flagged columns need one of: (a) exact DECIMAL/integer accumulation
upstream plus a contract at a safe magnitude (ratio / scaled units), or
(b) a written justification that the value is an exact integer-valued
double (integer counts sum exactly in any order below 2^53).

Usage: python tools/audit_rounding.py [sf_dir] [--json OUT.json]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

THRESH = 2.0**53 * 1e-6  # ~9.007e9: ROUND(x,6) is sub-ULP beyond this


def main() -> int:
    args = [a for a in sys.argv[1:]]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from mcas_question2_etl_spark.plans.suite import SPECS
    from tests.oracle import duck_connection

    duck = duck_connection(sf_dir)
    flagged: dict[str, dict] = {}
    errors: dict[str, str] = {}
    n_checked = 0
    for spec in SPECS:
        if spec.oracle is None:
            continue
        try:
            # schema probe first; stats computed INSIDE DuckDB (a
            # fetchall of a full-table spec at sf0.1 is 600k Python
            # tuples per spec — the audit must aggregate engine-side)
            desc = duck.execute(
                f"DESCRIBE SELECT * FROM ({spec.oracle}) q"
            ).fetchall()
            dbl_cols = [d[0] for d in desc if d[1] in ("DOUBLE", "FLOAT")]
            if not dbl_cols:
                n_checked += 1
                continue
            agg = ", ".join(
                f'max(abs("{c}")) FILTER (isfinite("{c}")) AS "mx_{c}", '
                f'bool_and("{c}" = floor("{c}")) FILTER (isfinite("{c}"))'
                f' AS "int_{c}"'
                for c in dbl_cols
            )
            row = duck.execute(
                f"SELECT {agg} FROM ({spec.oracle}) q"
            ).fetchone()
        except Exception as exc:  # noqa: BLE001
            errors[spec.name] = repr(exc)[:200]
            continue
        n_checked += 1
        print(f"[{n_checked}] {spec.name}", flush=True)
        hot = {}
        for i, c in enumerate(dbl_cols):
            mx, intish = row[2 * i], row[2 * i + 1]
            if mx is not None and mx > THRESH:
                hot[c] = {"max_abs": mx, "integer_valued": bool(intish)}
        if hot:
            flagged[spec.name] = hot
    print(f"checked {n_checked} oracle-backed specs at {sf_dir}")
    print(f"flagged {len(flagged)} specs with DOUBLE outputs > {THRESH:.3e}:")
    for name, hot in flagged.items():
        for c, info in hot.items():
            print(f"  {name}.{c}: max|v|={info['max_abs']:.4g}"
                  f" integer_valued={info['integer_valued']}")
    if errors:
        print(f"{len(errors)} oracle errors:")
        for n, e in errors.items():
            print(f"  {n}: {e}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "threshold": THRESH,
                       "checked": n_checked, "flagged": flagged,
                       "errors": errors}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
