"""Runtime shuffle-volume audit: MEASURED bytes, not plan node counts.

The static plan audit (scripts/plan_audit.py) counts exchanges; this
script runs each query to completion and reads the Spark UI REST API
(/api/v1/.../stages) to attribute ACTUAL shuffle-write bytes, input
bytes, and output rows to it — the "is there a shuffle here that
becomes the bottleneck at 100 TB" question answered with numbers: a
query whose shuffle-write is a small fraction of its input is map-side
reduced / pre-aggregated; one shuffling ~its input size is moving the
relation and needs a second look.

Usage: python scripts/shuffle_audit.py [sf_dir] [--json OUT] [query...]
Default queries: the bench.py slot list (the headline set).
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

_args = sys.argv[1:]
JSON_OUT = "SHUFFLE_AUDIT.json"
if "--json" in _args:
    i = _args.index("--json")
    JSON_OUT = _args[i + 1]
    _args = _args[:i] + _args[i + 2 :]
SF = _args[0] if _args else "/root/testdata/sf0.1"
ONLY = list(_args[1:])


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.load(r)


def _stage_totals(base: str, app_id: str) -> dict:
    tot = {"shuffle_write": 0, "shuffle_read": 0, "input_bytes": 0, "n_stages": 0}
    for st in _api(base, f"/api/v1/applications/{app_id}/stages?status=complete"):
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += st.get("shuffleReadBytes", 0)
        tot["input_bytes"] += st.get("inputBytes", 0)
        tot["n_stages"] += 1
    return tot


def _active_stages(base: str, app_id: str) -> int:
    return len(_api(base, f"/api/v1/applications/{app_id}/stages?status=active"))


def _settled_totals(base: str, app_id: str, timeout: float = 15.0) -> dict:
    """Poll the stages endpoint until the completed-stage count AND the
    byte totals are identical across two consecutive polls AND no stage
    is still active. The status store drains its event queue
    asynchronously — a fixed post-query sleep can attribute a
    late-completing stage's bytes to the NEXT query in the report.
    Requiring zero active stages closes the residual race (ADVICE r7)
    where a stage completing >0.2s after the previous drain could still
    slip through two coincidentally-identical polls."""
    prev = _stage_totals(base, app_id)
    deadline = time.time() + timeout
    while time.time() < deadline:
        time.sleep(0.2)
        cur = _stage_totals(base, app_id)
        if cur == prev and _active_stages(base, app_id) == 0:
            return cur
        prev = cur
    return prev  # pragma: no cover — status store stuck; report last poll


def main() -> None:
    import __spark_entry__ as entry
    from airflow_crypto_etl_spark.session import get_spark

    # UI must be ON — it is the metrics source
    spark = get_spark(
        app_name="shuffle-audit", extra_conf={"spark.ui.enabled": "true"}
    )
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    app_id = spark.sparkContext.applicationId

    queries = entry.queries()
    names = ONLY
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in queries]
    missing = [n for n in names if n not in queries]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    out: dict = {}
    for name in names:
        before = _settled_totals(base, app_id)
        t0 = time.time()
        try:
            n_rows = queries[name](spark, SF).count()
        except Exception as e:  # pragma: no cover — audit must not abort
            out[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
            continue
        wall = time.time() - t0
        after = _settled_totals(base, app_id)
        rec = {
            "rows": n_rows,
            "wall_s": round(wall, 3),
            "shuffle_write_bytes": after["shuffle_write"] - before["shuffle_write"],
            "shuffle_read_bytes": after["shuffle_read"] - before["shuffle_read"],
            "input_bytes": after["input_bytes"] - before["input_bytes"],
        }
        rec["shuffle_per_input"] = (
            round(rec["shuffle_write_bytes"] / rec["input_bytes"], 4)
            if rec["input_bytes"]
            else None
        )
        out[name] = rec
        print(f"{name}: in={rec['input_bytes']:>12,}  shuf={rec['shuffle_write_bytes']:>12,}  ratio={rec['shuffle_per_input']}")

    ok = [v for v in out.values() if "err" not in v]
    summary = {
        "n_queries": len(out),
        "sf_dir": SF,
        "total_input_bytes": sum(v["input_bytes"] for v in ok),
        "total_shuffle_write_bytes": sum(v["shuffle_write_bytes"] for v in ok),
        "top_shuffle_bytes": sorted(
            ((k, v["shuffle_write_bytes"]) for k, v in out.items() if "err" not in v),
            key=lambda t: -t[1],
        )[:10],
        "top_shuffle_per_input": sorted(
            (
                (k, v["shuffle_per_input"])
                for k, v in out.items()
                if "err" not in v and v["shuffle_per_input"] is not None
            ),
            key=lambda t: -t[1],
        )[:10],
    }
    with open(JSON_OUT, "w") as f:
        json.dump({"summary": summary, "queries": out}, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
