#!/usr/bin/env python
"""One-shot consolidation of plans/wave4..wave65 into six domain
modules (VERDICT r3 #7): same spec names, same bodies (modulo
collision-renamed private helpers), plans/ file count <= 15.

Run from the repo root. Rewrites tests' wave imports too, then deletes
the wave files. Verification is external: pytest + the contract gate.
"""

from __future__ import annotations

import ast
import os
import re
from collections import defaultdict

PLANS = "mcas_question2_etl_spark/plans"

DOMAINS = {
    "text_analytics": [9, 20, 32, 34, 36, 39, 51, 53, 55, 59, 65],
    "graph_specs": [5, 22, 42, 46, 61, 64],
    "timeseries_specs": [7, 10, 14, 24, 35, 49, 50, 52, 63],
    "stats_specs": [6, 19, 28, 29, 33, 40, 41, 47, 56, 57, 58, 62],
    "curation_specs": [4, 11, 15, 16, 17, 18, 21, 23, 25, 26, 27, 30, 31, 38],
    "ops_bi_specs": [8, 12, 13, 37, 43, 44, 45, 48, 54, 60],
}

DOC = {
    "text_analytics": "Text/NLP/LM/retrieval analytics specs",
    "graph_specs": "Graph-analytics specs (motifs, communities, centrality)",
    "timeseries_specs": "Time-series specs (rollups, trends, seasonality, changepoints)",
    "stats_specs": "Statistical-inference and experimentation specs",
    "curation_specs": "Training-data curation specs (dedup, sampling, linkage, ANN, layout, multimodal)",
    "ops_bi_specs": "Operational/BI/geo specs (audits, attribution, spatial, dimensions)",
}


def split_wave(path: str):
    """Return (docstring, import_lines, body_text, top_names)."""
    src = open(path).read()
    tree = ast.parse(src)
    lines = src.splitlines(keepends=True)
    doc = ast.get_docstring(tree) or ""
    imports: list[str] = []
    body_start = None
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            seg = "".join(lines[node.lineno - 1 : node.end_lineno])
            if "from __future__" not in seg and "QuerySpec" not in seg:
                imports.append(seg.rstrip("\n"))
        if (
            isinstance(node, ast.FunctionDef)
            and node.name == "_spec"
            and body_start is None
        ):
            body_start = node.end_lineno  # body begins after the helper
    assert body_start is not None, path
    body = "".join(lines[body_start:])
    # top-level names defined in the body (for collision detection)
    names = set()
    for node in ast.parse(body).body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.add(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.add(node.target.id)
    return doc, imports, body, names


def main() -> None:
    wave_info = {}
    for n in sorted(
        int(re.search(r"wave(\d+)", f).group(1))
        for f in os.listdir(PLANS)
        if re.fullmatch(r"wave\d+\.py", f)
    ):
        wave_info[n] = split_wave(f"{PLANS}/wave{n}.py")

    assigned = [n for ws in DOMAINS.values() for n in ws]
    assert sorted(assigned) == sorted(wave_info), (
        sorted(set(wave_info) - set(assigned)),
        sorted(set(assigned) - set(wave_info)),
    )

    renames: dict[int, dict[str, str]] = defaultdict(dict)  # wave -> old -> new
    wave_domain: dict[int, str] = {}

    for domain, waves in DOMAINS.items():
        seen: dict[str, int] = {}
        for n in waves:
            wave_domain[n] = domain
            _, _, _, names = wave_info[n]
            for nm in sorted(names):
                if nm in seen:
                    renames[n][nm] = f"{nm}_w{n}"
                else:
                    seen[nm] = n

    for domain, waves in DOMAINS.items():
        imports: list[str] = []
        sections: list[str] = []
        provenance: list[str] = []
        for n in waves:
            doc, imps, body, _ = wave_info[n]
            for i in imps:
                if i not in imports:
                    imports.append(i)
            for old, new in renames[n].items():
                body = re.sub(rf"(?<![\w.]){re.escape(old)}(?!\w)", new, body)
            first = doc.splitlines()[0] if doc else ""
            provenance.append(f"#   wave{n}: {first}")
            sections.append(
                f"\n\n# {'─' * 74}\n# wave{n}\n# {'─' * 74}\n{body.strip()}\n"
            )
        header = (
            f'"""{DOC[domain]}.\n\n'
            "Consolidated from the round-1..3 wave modules (round 4, VERDICT r3\n"
            "#7): spec names, oracles and bodies are unchanged (module-private\n"
            "helpers colliding across waves carry a _w<N> suffix). Constituent\n"
            "waves and their original one-line scopes:\n\n"
            + "\n".join(provenance)
            + '\n"""\n\n'
            "from __future__ import annotations\n\n"
            + "\n".join(sorted(set(imports), key=imports.index))
            + "\n\nfrom ..registry import QuerySpec\n\n"
            "SPECS: list[QuerySpec] = []\n\n\n"
            "def _spec(name: str, oracle: str | None, survey_ref: str):\n"
            "    def wrap(fn):\n"
            "        SPECS.append(QuerySpec(name=name, fn=fn, oracle=oracle,"
            " survey_ref=survey_ref))\n"
            "        return fn\n\n"
            "    return wrap\n"
        )
        with open(f"{PLANS}/{domain}.py", "w") as f:
            f.write(header + "".join(sections))

    # rewrite suite.py
    suite = open(f"{PLANS}/suite.py").read()
    suite = re.sub(r"from \. import wave\d+ as _wave\d+\n", "", suite)
    dom_imports = "".join(
        f"from . import {d} as _{d}\n" for d in DOMAINS
    )
    suite = suite.replace(
        "from ..registry import QuerySpec\n",
        "from ..registry import QuerySpec\n" + dom_imports,
    )
    dom_specs = "".join(f"    *_{d}.SPECS,\n" for d in DOMAINS)
    suite = suite.replace(
        "    *_tpch.SPECS,\n", "    *_tpch.SPECS,\n" + dom_specs
    )
    suite = re.sub(r"    \*_wave\d+\.SPECS,\n", "", suite)
    open(f"{PLANS}/suite.py", "w").write(suite)

    # rewrite tests and any other references
    targets = []
    for root in ("tests", "mcas_question2_etl_spark"):
        for dirpath, _, files in os.walk(root):
            targets += [os.path.join(dirpath, f) for f in files if f.endswith(".py")]
    for path in targets:
        src = open(path).read()
        orig = src
        for n, domain in wave_domain.items():
            src = src.replace(
                f"mcas_question2_etl_spark.plans.wave{n} import",
                f"mcas_question2_etl_spark.plans.{domain} import",
            )
            src = src.replace(f"from .wave{n} import", f"from .{domain} import")
            src = src.replace(
                f"mcas_question2_etl_spark.plans import wave{n}",
                f"mcas_question2_etl_spark.plans import {domain} as wave{n}",
            )
        # apply renames to test references (imports of renamed privates)
        for n, rmap in renames.items():
            d = wave_domain[n]
            for old, new in rmap.items():
                # only rewrite in files importing from this wave's domain
                if f"plans.{d} import" in src or f"plans import {d}" in src:
                    pat = rf"(?<![\w.]){re.escape(old)}(?!\w)"
                    if re.search(rf"import[^\n]*(?<![\w.]){re.escape(old)}(?!\w)", src):
                        src = re.sub(pat, new, src)
        if src != orig:
            open(path, "w").write(src)

    for n in wave_info:
        os.remove(f"{PLANS}/wave{n}.py")

    # report renames for the log
    for n in sorted(renames):
        if renames[n]:
            print(f"wave{n} renames: {renames[n]}")
    print("domains written:", ", ".join(DOMAINS))


if __name__ == "__main__":
    main()
