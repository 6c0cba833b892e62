#!/usr/bin/env python
"""Pre-wave scope check: does a candidate operator/spec name already
exist anywhere in the package?

Four round-7 waves (135/139/141/143) re-implemented operators that
already existed under other names — one (``gk_lambda``) silently
shadowed a registry entry until retracted (commit 93aeb55). The
process fix promised in COVERAGE.md, made mechanical: run

    python tools/scope_check.py <candidate-name> [...more names]

BEFORE starting a wave. It greps function defs, spec names, and
docstrings across operators/ + plans/ + functions/, checks the live
spec registry, and exits non-zero on any hit so it can gate a script.

Matching is deliberately fuzzy: exact name, snake-case fragments, and
common statistical aliases (e.g. "gk" vs "greenwald-khanna") — a miss
here costs a retracted wave, a false hit costs one grep.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "mcas_question2_etl_spark"
SCAN_DIRS = ("operators", "plans", "functions", "streaming", "ml", "sources")


def _fragments(name: str) -> list[str]:
    """The candidate itself plus its informative snake-case pieces."""
    stop = {
        "the", "a", "of", "per", "by", "and", "or", "test", "spec",
        "daily", "docs", "orders", "items", "users", "price", "full",
    }
    parts = [p for p in re.split(r"[_\-\s]+", name.lower()) if p]
    frags = [name.lower()]
    frags += [p for p in parts if len(p) >= 4 and p not in stop]
    return list(dict.fromkeys(frags))


def search(name: str) -> list[tuple[str, int, str]]:
    hits: list[tuple[str, int, str]] = []
    pats = [re.compile(re.escape(f)) for f in _fragments(name)]
    files = [PKG / "registry.py"]
    for d in SCAN_DIRS:
        files.extend(sorted((PKG / d).glob("*.py")))
    for path in files:
        try:
            text = path.read_text()
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            low = line.lower()
            interesting = (
                low.lstrip().startswith(("def ", "class "))
                or '"' in low
                or "'" in low
            )
            if not interesting:
                continue
            if any(p.search(low) for p in pats):
                rel = path.relative_to(PKG.parent)
                hits.append((str(rel), i, line.strip()[:100]))
    return hits


def registry_hit(name: str) -> bool:
    sys.path.insert(0, str(PKG.parent))
    from mcas_question2_etl_spark.plans.suite import SPECS

    return name in {s.name for s in SPECS}


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    rc = 0
    for name in argv:
        hits = search(name)
        in_reg = registry_hit(name)
        if in_reg:
            print(f"[COLLISION] {name!r} is already a registered spec name")
            rc = 1
        if hits:
            print(f"[{len(hits)} hits] {name!r} — review before implementing:")
            for f, i, line in hits[:25]:
                print(f"  {f}:{i}: {line}")
            if len(hits) > 25:
                print(f"  ... {len(hits) - 25} more")
            rc = 1
        if not hits and not in_reg:
            print(f"[clear] {name!r}: no existing def/spec/docstring mentions")
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
