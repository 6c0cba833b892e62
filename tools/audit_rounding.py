#!/usr/bin/env python
"""Rounding-magnitude audit over every oracle-backed spec (VERDICT r6 #3).

The r6 driver-gate flaps came from ROUND(x, k) applied to doubles whose
magnitude exceeds 2^53 * 10^-k: past that point the double's ULP is
larger than the rounding granularity, so ANY order-dependent drift in
an upstream unordered double sum flips the rounded value (and the
driver hash). This tool runs each spec's DuckDB oracle at a given sf
and reports every DOUBLE output column whose max |value| crosses the
threshold for k=6 (the suite-wide default round_to), i.e. 9.007e9.

Corrected rule (r8, VERDICT r7 #1/#2): upstream order discipline is
NECESSARY but NOT SUFFICIENT — the r8 investigation showed ROUND(x, k)
itself diverges cross-engine on BIT-IDENTICAL doubles once |x|*10^k
exceeds 2^53, because DuckDB rounds via ``x * 10^k`` (an inexact double
product past that bound) while Spark rounds the shortest decimal repr
(BigDecimal HALF_UP). Observed: ROUND(92123456789.125, 6) → Spark
.125 / DuckDB .12498 — no sum ordering involved. Therefore:

  * A ROUNDED double column is safe ONLY if max|v| * 10^k < 2^53 for
    its ACTUAL per-column round scale k (this tool regex-extracts
    ``ROUND(..., k) AS col`` pairs from each oracle — the r7 audit
    assumed k=6 everywhere and missed a k=4 column at 1.6e13).
  * An UNROUNDED double column above the k=6 threshold is safe only if
    it is a once-cast exact DECIMAL/integer value or a closed-form
    expression with identical shape in both engines (bit-identical
    bits need no rounding to agree), AND every upstream aggregation
    level is order-free — not just the leaf moments.
  * Otherwise: re-contract the output as an intensive quantity
    (ratio / rmse / per-unit / sqrt), the press_rmse precedent.

Usage: python tools/audit_rounding.py [sf_dir] [--json OUT.json]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

THRESH = 2.0**53 * 1e-6  # ~9.007e9: ROUND(x,6) is sub-ULP beyond this


def round_scales(oracle: str) -> "dict[str, int]":
    """Per-column round scale: parse ``ROUND(expr, k) AS alias`` pairs
    out of the oracle SQL (balanced-paren walk from each ROUND( site,
    then the trailing ``, k ) AS alias``). Best-effort — a column not
    matched falls back to the suite default k=6."""
    scales: dict[str, int] = {}
    for m in re.finditer(r"\bROUND\s*\(", oracle, re.I):
        depth, i = 1, m.end()
        while i < len(oracle) and depth:
            if oracle[i] == "(":
                depth += 1
            elif oracle[i] == ")":
                depth -= 1
            i += 1
        inner = oracle[m.end() : i - 1]
        tail = oracle[i:]
        km = re.search(r",\s*(\d+)\s*$", inner)
        am = re.match(r'\s+AS\s+"?([A-Za-z_][A-Za-z0-9_]*)"?', tail, re.I)
        if km and am:
            scales[am.group(1)] = int(km.group(1))
    return scales


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
        scales = round_scales(spec.oracle)
        hot = {}
        for i, c in enumerate(dbl_cols):
            mx, intish = row[2 * i], row[2 * i + 1]
            if mx is None:
                continue
            k = scales.get(c)
            rounded = k is not None
            # rounded columns: exact-ROUND bound at their own scale;
            # unrounded: keep the k=6 reporting threshold (they need
            # the bit-identical-closed-form justification instead)
            limit = 2.0**53 / (10.0**k) if rounded else THRESH
            if mx > limit:
                hot[c] = {
                    "max_abs": mx,
                    "integer_valued": bool(intish),
                    "round_scale": k,
                    "rounded": rounded,
                }
        if hot:
            flagged[spec.name] = hot
    print(f"checked {n_checked} oracle-backed specs at {sf_dir}")
    print(f"flagged {len(flagged)} specs with DOUBLE outputs > {THRESH:.3e}:")
    for name, hot in flagged.items():
        for c, info in hot.items():
            print(f"  {name}.{c}: max|v|={info['max_abs']:.4g}"
                  f" integer_valued={info['integer_valued']}"
                  f" rounded={info['rounded']}"
                  f" round_scale={info['round_scale']}")
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
