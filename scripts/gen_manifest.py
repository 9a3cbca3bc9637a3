#!/usr/bin/env python
"""Emit MANIFEST.json: the registry grouped family → query names, so a
driver sampling K of the 250+ registered queries can STRATIFY by family
and exercise every family each round instead of whatever a uniform
sample happens to hit (round-5 verdict item 5).

Families are the source modules (the registry is organized by domain);
oracle coverage is recorded per query so the manifest also documents
which entries are hash-checked vs rows-only.

Regenerate after adding queries:  python scripts/gen_manifest.py
The parity suite asserts the committed file is current.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build() -> dict:
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    families: dict[str, list] = {}
    for name, fn in queries.items():
        # _finalized wraps each query; the family is the module the
        # underlying builder lives in
        inner = getattr(fn, "__wrapped__", fn)
        mod = getattr(inner, "__module__", "unknown")
        fam = mod.rsplit(".", 1)[-1].removeprefix("queries_") or "core"
        if fam == "queries":
            fam = "core"
        families.setdefault(fam, []).append(name)
    out = {
        "n_queries": len(queries),
        "n_oracle_checked": len([n for n in queries if n in oracles]),
        "rows_only": sorted(n for n in queries if n not in oracles),
        "families": {
            fam: sorted(names) for fam, names in sorted(families.items())
        },
    }
    return out


if __name__ == "__main__":
    manifest = build()
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "MANIFEST.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: {manifest['n_queries']} queries, "
          f"{len(manifest['families'])} families")
