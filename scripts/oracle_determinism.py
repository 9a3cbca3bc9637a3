"""Oracle determinism audit: every registered DuckDB oracle, run K times
on FRESH connections with varying PRAGMA threads, must produce identical
normalized output.

Why this exists: round 6 shipped a green CORRECTNESS artifact whose
q_dedup_span_coverage row was a coin flip — the oracle's interval-union
sweep computed the island-open flag and the island running sum in two
separate window scans over a TIED ORDER BY, and DuckDB's tie order
differed between scans on some connections (covered_tokens flipped
78/156). A "probably unique ORDER BY" is not evidence; this harness
makes oracle stability a measured, committed fact. Fresh connections +
varied thread counts are the two knobs that changed DuckDB's physical
tie order in the observed flake.

Normalization mirrors the driver/test compare (tests/test_oracle_parity
_norm): columns sorted by name, rows sorted as normalized-string tuples,
floats at fixed %.4f precision, Decimal kept distinct from float.

Usage: python scripts/oracle_determinism.py [sf_dir] [--runs K]
           [--json OUT] [query...]
Exit 1 if any oracle is flaky, 2 on unknown query names.
"""
from __future__ import annotations

import hashlib
import json
import pathlib
import sys

# repo root derived from this file's location, not hardcoded (ADVICE r7)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Thread counts cycled across runs: single-threaded, and two parallel
# widths — parallel merge order is what flipped the round-6 flake.
THREADS = (1, 4, 8)


def _norm(v) -> str:
    import datetime as dt
    import decimal
    import math

    if v is None:
        return "␀"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.4f}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    return f"{type(v).__name__[0]}:{v}"


def run_oracle_hash(sql: str, sf_dir: str, threads: int) -> str:
    """One fresh-connection evaluation → sha256 of normalized output."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(f"PRAGMA threads={threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        names = [d[0] for d in cur.description]
        order = sorted(range(len(names)), key=lambda i: names[i])
        rows = sorted(
            tuple(_norm(row[i]) for i in order) for row in cur.fetchall()
        )
        payload = repr((sorted(names), rows)).encode()
        return hashlib.sha256(payload).hexdigest()
    finally:
        con.close()


def audit(
    sf_dir: str, runs: int = 3, only: list[str] | None = None
) -> dict[str, dict]:
    """Run every oracle `runs` times; return {name: {stable, hashes,
    err}}. Stable = one distinct hash across all fresh-connection runs."""
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    names = only if only else sorted(oracles)
    unknown = [n for n in names if n not in oracles]
    if unknown:
        raise KeyError(f"unknown oracle names: {unknown}")
    out: dict[str, dict] = {}
    for name in names:
        hashes: list[str] = []
        err = None
        for r in range(runs):
            try:
                hashes.append(
                    run_oracle_hash(
                        oracles[name], sf_dir, THREADS[r % len(THREADS)]
                    )
                )
            except Exception as e:  # pragma: no cover — audit must not abort
                err = f"{type(e).__name__}: {e}"[:200]
                break
        out[name] = {
            "stable": err is None and len(set(hashes)) == 1,
            "distinct_hashes": len(set(hashes)),
            "runs": len(hashes),
            "err": err,
        }
    return out


def main() -> None:
    args = sys.argv[1:]
    runs, json_out = 3, "ORACLE_DETERMINISM.json"
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = list(args[1:]) or None
    if only and "--json" not in sys.argv:
        # a targeted subset run must not clobber the committed
        # registry-wide artifact (bit us in r8: a 2-query spot check
        # overwrote the 291-oracle record between commits)
        json_out = None
    try:
        res = audit(sf_dir, runs=runs, only=only)
    except KeyError as e:
        print(e, file=sys.stderr)
        sys.exit(2)
    flaky = sorted(n for n, r in res.items() if not r["stable"])
    for n in flaky:
        print(f"FLAKY {n}: {res[n]}")
    summary = {
        "sf_dir": sf_dir,
        "runs_per_oracle": runs,
        "threads_cycle": list(THREADS),
        "n_oracles": len(res),
        "n_stable": sum(r["stable"] for r in res.values()),
        "flaky": flaky,
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "oracles": res}, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    sys.exit(1 if flaky else 0)


if __name__ == "__main__":
    main()
