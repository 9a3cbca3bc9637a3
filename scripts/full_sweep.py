"""Sharded full-registry correctness sweep: run driver_sim in N
parallel subprocesses (query names split round-robin by sorted index)
and merge the per-shard JSON reports into one CORRECTNESS file.

Why: the sequential sweep alternates one Spark query (local[16]) with
one DuckDB oracle — each leaves most of the box idle while the other
runs. Four shards overlap them and cut the sf1 leg's wall time ~3-4×
(r7 verdict item 3 — evidence-regeneration cost taxes every round).
Shards are plain driver_sim processes, so the per-query semantics,
normalization, and pass/fail criteria are byte-identical to the
driver's; only the orchestration is new.

Usage: python scripts/full_sweep.py [sf_dir] [--procs N] [--json OUT]
           [--balance PRIOR.json]
--balance uses a prior report's per-query wall_s for longest-
processing-time-first shard assignment (the default round-robin left
one shard holding most of the dedup family in the first r8 sf1 run:
72 min wall while its siblings finished in ~36).

Dead-shard recovery (r9 verdict item 3): a shard JVM that dies under
contention (the 60-missed-heartbeats stall — three manual
re-run-and-merge incidents through r9) leaves its names out of the
merged report; any such names are automatically re-run in ONE
single-process driver_sim pass and merged, each record tagged
"recovered": true, so the sweep completes unattended.

Exit 1 if any query ultimately failed or recovery itself died.
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import tempfile
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> int:
    args = sys.argv[1:]
    procs = 4
    json_out = None
    if "--procs" in args:
        i = args.index("--procs")
        procs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    balance = None
    if "--balance" in args:
        i = args.index("--balance")
        balance = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf = args[0] if args else "/root/testdata/sf0.01"

    import __spark_entry__ as e

    names = sorted(e.queries())
    if balance:
        prior = json.loads(pathlib.Path(balance).read_text())
        cost = {n: float(prior.get(n, {}).get("wall_s") or 1.0) for n in names}
        # LPT: heaviest first into the currently-lightest shard
        shards = [[] for _ in range(procs)]
        loads = [0.0] * procs
        for n in sorted(names, key=lambda x: -cost[x]):
            j = loads.index(min(loads))
            shards[j].append(n)
            loads[j] += cost[n]
        print("balanced shard loads (prior-s):", [round(x) for x in loads])
    else:
        shards = [names[i::procs] for i in range(procs)]
    t0 = time.time()
    tmp = tempfile.mkdtemp(prefix="sweep_")
    running = []
    for i, shard in enumerate(shards):
        out = f"{tmp}/shard{i}.json"
        log = open(f"{tmp}/shard{i}.log", "w")
        p = subprocess.Popen(
            # -u: unbuffered stdout so per-query ok/FAIL lines hit the
            # shard log as they happen (block-buffered stdout otherwise
            # flushes ~every 8KB — invisible progress for minutes)
            [sys.executable, "-u", str(ROOT / "scripts/driver_sim.py"), sf, "--json", out, *shard],
            stdout=log, stderr=log, cwd=str(ROOT),
        )
        running.append((p, out, log))
    merged: dict = {}
    broken = False  # infrastructure damage recovery could not repair
    for i, (p, out, log) in enumerate(running):
        p.wait()
        log.close()
        if p.returncode not in (0, 1):
            # shard death (heartbeat stall / OOM) — its names surface
            # as missing below and go through recovery
            print(f"shard {i} died rc={p.returncode} (see {log.name})")
            continue
        try:
            merged.update(json.loads(pathlib.Path(out).read_text()))
        except Exception as ex:  # noqa: BLE001
            print(f"shard {i}: unreadable report: {ex}")
    missing = [n for n in names if n not in merged]
    if missing:
        merged.update(recover(sf, missing, tmp))
    n_pass = sum(
        1 for r in merged.values()
        if r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
    )
    still_missing = [n for n in names if n not in merged]
    if still_missing:
        print(f"MISSING from merged report after recovery: {still_missing}")
        broken = True
    print(
        f"sweep: {n_pass}/{len(names)} pass in {time.time()-t0:.0f}s "
        f"({procs} shards, logs in {tmp})"
    )
    for n, r in sorted(merged.items()):
        if not (r.get("rows_match") and r.get("schema_match") and r.get("hash_match")):
            print(f"  FAIL {n}: {r}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(merged)} queries)")
    return 1 if (broken or n_pass != len(names)) else 0


def recover(sf: str, missing: list[str], tmp: str) -> dict:
    """Re-run ``missing`` names in ONE sequential driver_sim process
    (the heartbeat stall is a contention failure, so the retry
    deliberately runs alone) and return their records tagged
    ``recovered: true`` so the artifact shows which rows came from the
    retry pass."""
    print(f"{len(missing)} names missing (dead shard?) — recovering: {missing}")
    fix = f"{tmp}/recover.json"
    with open(f"{tmp}/recover.log", "w") as log:
        try:
            # generous per-name budget: the failure mode recovery exists
            # for is a heartbeat STALL, so an un-timeboxed retry that
            # itself stalls would hang the sweep forever instead of
            # exiting 1 (r10 ADVICE)
            p = subprocess.run(
                [sys.executable, "-u", str(ROOT / "scripts/driver_sim.py"),
                 sf, "--json", fix, *missing],
                stdout=log, stderr=log, cwd=str(ROOT),
                timeout=600 + 300 * len(missing),
            )
        except subprocess.TimeoutExpired:
            print(f"recovery pass timed out — see {tmp}/recover.log")
            return {}
    try:
        got = json.loads(pathlib.Path(fix).read_text())
    except Exception as ex:  # noqa: BLE001
        print(f"recovery pass unreadable ({ex}) — see {tmp}/recover.log")
        return {}
    for r in got.values():
        r["recovered"] = True
    print(f"recovered {len(got)}/{len(missing)} (rc={p.returncode})")
    return got


if __name__ == "__main__":
    raise SystemExit(main())
