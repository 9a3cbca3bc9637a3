"""Per-action profiler for declared queries (optimization-round tooling).

Monkey-patches the eager Spark entry points (DataFrameWriter.parquet,
DataFrame.collect / count / toLocalIterator) with wall-clock timers so a
lifecycle query's internal actions (index writes, codebook collects)
are each measured, then times the final returned DataFrame through the
noop sink (guide §1.4 — computes every column, no sink cost).

Usage: python scripts/profile_actions.py [SF_DIR] q1 q2 ...
Prints one line per inner action (caller site, seconds) and the final
noop-sink time, repeated REPS times (env SPARK_GRAFT_PROFILE_REPS,
default 2 — first rep is warm-up/JIT, read the second).
"""
from __future__ import annotations

import os
import pathlib
import sys
import time
import traceback

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> int:
    args = sys.argv[1:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args

    # Spark 4: pyspark.sql.DataFrame is the abstract parent; the
    # concrete methods live on the classic class — patch THAT.
    from pyspark.sql.classic.dataframe import DataFrame
    from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

    events: list[tuple[str, str, float]] = []

    def _site() -> str:
        # innermost repo frame that is not this file
        for f in reversed(traceback.extract_stack()):
            fn = f.filename
            if "airflow_crypto_etl_spark" in fn or fn.endswith("__spark_entry__.py"):
                return f"{pathlib.Path(fn).name}:{f.lineno}({f.name})"
        return "?"

    def timed(kind, orig):
        def wrapper(self, *a, **kw):
            t0 = time.perf_counter()
            out = orig(self, *a, **kw)
            events.append((kind, _site(), time.perf_counter() - t0))
            return out

        return wrapper

    DataFrameWriter.parquet = timed("write.parquet", DataFrameWriter.parquet)
    DataFrameReader.parquet = timed("read.parquet", DataFrameReader.parquet)
    DataFrame.collect = timed("collect", DataFrame.collect)
    DataFrame.count = timed("count", DataFrame.count)
    DataFrame.localCheckpoint = timed("localCheckpoint", DataFrame.localCheckpoint)

    from airflow_crypto_etl_spark.session import get_spark

    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark(app_name="action-profile")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
    for n in names:
        fn = qs[n]
        for rep in range(reps):
            events.clear()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_noop = time.perf_counter() - t1
            print(f"== {n} rep{rep}: construct+inner={t_build:.3f}s noop-exec={t_noop:.3f}s total={t_build + t_noop:.3f}s")
            for kind, site, secs in events:
                print(f"   {secs:7.3f}s  {kind:14s} {site}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
