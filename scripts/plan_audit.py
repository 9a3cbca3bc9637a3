"""Per-query physical-plan audit over the ENTIRE registry.

For each of the 250 registered queries, builds the DataFrame at the
given sf dir and walks the pre-AQE physical plan, counting the node
classes that determine behavior at 100 TB: shuffle exchanges,
broadcast exchanges, sorts, windows, Arrow/Pandas Python stages, and
parquet scans (with/without pushed filters). Emits PLAN_AUDIT.json:

    {"queries": {name: {counts...}}, "summary": {...}}

The hard plan GATES live in tests/test_oracle_parity.py (no row-wise
Python UDFs, no cartesian products, no unpartitioned windows over
unbounded relations); this script is the measurement companion — the
machine-checkable answer to "is there a shuffle here that becomes the
bottleneck at scale?" for every registered plan, not a sampled few.

Usage: python scripts/plan_audit.py [sf_dir] [--json PLAN_AUDIT.json]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

_args = sys.argv[1:]
JSON_OUT = "PLAN_AUDIT.json"
if "--json" in _args:
    i = _args.index("--json")
    JSON_OUT = _args[i + 1]
    _args = _args[:i] + _args[i + 2 :]
SF = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

# simpleName -> audit bucket. Anything Python-side that is NOT Arrow-
# vectorized (BatchEvalPython) is banned by the parity gate already.
_PYTHON_NODES = {
    "ArrowEvalPythonExec",
    "ArrowEvalPythonUDTFExec",
    "MapInPandasExec",
    "PythonMapInArrowExec",
    "MapInBatchExec",
    "FlatMapGroupsInPandasExec",
    "FlatMapGroupsInPandasWithStateExec",
    "AggregateInPandasExec",
    "WindowInPandasExec",
}


def _walk(plan):
    stack, nodes = [plan], []
    while stack:
        node = stack.pop()
        nodes.append(node)
        # descend into AQE's initial plan — exchanges live there
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        kids = node.children()
        for i in range(kids.length()):
            stack.append(kids.apply(i))
        # subqueries (scalar binds) are plan children too
        try:
            sq = node.subqueries()
            it = sq.iterator()
            while it.hasNext():
                stack.append(it.next().plan())
        except Exception:
            pass
    return nodes


def _top_level_fields(read_schema: str) -> int:
    """Count top-level fields of a ``struct<...>`` ReadSchema string.

    Commas inside nested ``struct<>``/``array<>``/``map<>`` types are
    not field separators, so track angle-bracket depth.
    """
    s = read_schema.strip()
    if not s.startswith("struct<") or not s.endswith(">"):
        return -1
    body = s[len("struct<") : -1]
    if not body:
        return 0
    depth, n = 0, 1
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


_TABLE_NAMES = (
    "lineitem", "orders", "customer", "supplier", "partsupp", "part",
    "nation", "region", "events", "documents", "embeddings",
)


def _table_of(location: str) -> str:
    for t in _TABLE_NAMES:
        if f"/{t}.parquet" in location or f"/{t}/" in location:
            return t
    return "?"


def audit_one(df) -> dict:
    # executedPlan, not sparkPlan: EnsureRequirements inserts the
    # Exchange nodes there, which is the whole point of the audit
    plan = df._jdf.queryExecution().executedPlan()
    counts = {
        "shuffles": 0,
        "broadcasts": 0,
        "sorts": 0,
        "windows": 0,
        "unpartitioned_windows": 0,
        "python_arrow_stages": 0,
        "scans": 0,
        "scans_with_pushed_filters": 0,
        "joins": 0,
    }
    for node in _walk(plan):
        name = node.getClass().getSimpleName()
        if name == "ShuffleExchangeExec":
            counts["shuffles"] += 1
        elif name == "BroadcastExchangeExec":
            counts["broadcasts"] += 1
        elif name == "SortExec":
            counts["sorts"] += 1
        elif name in ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec"):
            counts["windows"] += 1
            if node.partitionSpec().isEmpty():
                counts["unpartitioned_windows"] += 1
        elif name.endswith("JoinExec"):
            counts["joins"] += 1
        elif name == "FileSourceScanExec":
            counts["scans"] += 1
            meta = node.metadata()
            pushed = ""
            if meta.contains("PushedFilters"):
                pushed = str(meta.apply("PushedFilters"))
            if pushed and pushed != "[]":
                counts["scans_with_pushed_filters"] += 1
            # column pruning: top-level field count actually read
            table, ncols = "?", -1
            if meta.contains("Location"):
                table = _table_of(str(meta.apply("Location")))
            if meta.contains("ReadSchema"):
                ncols = _top_level_fields(str(meta.apply("ReadSchema")))
            counts.setdefault("scan_widths", []).append([table, ncols])
        if name in _PYTHON_NODES:
            counts["python_arrow_stages"] += 1
    return counts


def main() -> None:
    import __spark_entry__ as entry
    from airflow_crypto_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    queries = entry.queries()
    out: dict = {}
    t0 = time.time()
    for name, fn in sorted(queries.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF)
            out[name] = audit_one(df)
        except Exception as e:  # pragma: no cover - audit must not abort
            out[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
    ok = [v for v in out.values() if "err" not in v]
    # table widths from the parquet footers (for the pruning ratio)
    widths: dict = {}
    for t in _TABLE_NAMES:
        try:
            widths[t] = len(spark.read.parquet(f"{SF}/{t}.parquet").columns)
        except Exception:
            pass
    read_cols = avail_cols = 0
    full_width = []  # (query, table, width) where a wide table is read unpruned
    for k, v in out.items():
        for table, n in v.get("scan_widths", []):
            w = widths.get(table, 0)
            if n < 0 or not w:
                continue
            read_cols += n
            avail_cols += w
            if n == w and w >= 6:
                full_width.append([k, table, w])
    summary = {
        "n_queries": len(out),
        "n_audited": len(ok),
        "total_shuffles": sum(v["shuffles"] for v in ok),
        "total_broadcasts": sum(v["broadcasts"] for v in ok),
        "queries_with_unpartitioned_windows": sorted(
            k for k, v in out.items() if v.get("unpartitioned_windows")
        ),
        "queries_with_python_stages": sum(
            1 for v in ok if v["python_arrow_stages"]
        ),
        "scan_pushdown": {
            "scans": sum(v["scans"] for v in ok),
            "with_pushed_filters": sum(v["scans_with_pushed_filters"] for v in ok),
        },
        "column_pruning": {
            "read_cols": read_cols,
            "available_cols": avail_cols,
            "read_fraction": round(read_cols / avail_cols, 4) if avail_cols else None,
            "full_width_scans": sorted(full_width),
        },
        "top_shuffles": sorted(
            ((k, v["shuffles"]) for k, v in out.items() if "err" not in v),
            key=lambda t: -t[1],
        )[:10],
        "wall_s": round(time.time() - t0, 1),
        "sf_dir": SF,
    }
    doc = {"summary": summary, "queries": out}
    with open(JSON_OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
