"""bench.py is the driver's per-round measurement CLI — a breakage
there costs a round's BENCH record, so smoke-test the contract: one
JSON line on stdout with the expected shape."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_cli_contract():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REPS="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {proc.stdout[-500:]}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "headline_total" and rec["unit"] == "sec"
    assert rec["value"] > 0 and rec["sf"] == 0.001
    assert len(rec["queries"]) >= 25
    assert all(v >= 0 for v in rec["queries"].values())
    assert "partitioned_write" in rec["queries"] and "q_gold_daily" in rec["queries"]
