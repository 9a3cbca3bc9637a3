#!/usr/bin/env python
"""Derive an sf1 (10×) bench dataset from the driver's read-only sf0.1
tables (round-5 verdict item 3: one 10× bench leg so "orders of
magnitude of headroom" becomes a number).

/root/testdata is read-only and has no sf1, so sf1 is SYNTHESIZED from
sf0.1 by key-shifted copies — the scaling_probe.inflate construction,
materialized to parquet so bench.py can point SPARK_GRAFT_SF_DIR at it:

- every copy shifts ALL entity keys by i·10⁹ consistently, so
  referential integrity (lineitem↔orders↔customer, lineitem↔part/
  supplier, events.user_id, embeddings.vec_id) survives and join/group
  cardinalities scale with the data;
- nation/region stay fixed (dimensions — same at any TPC-H sf);
- document TEXT is token-mangled per copy (every token suffixed
  ``_c<i>``), so copies are NOT near-duplicates: dedup slots measure
  plan behavior on a 10× corpus, not a quadratic blow-up of genuine
  duplicate pairs (the probe's documented copy-inflation caveat), and
  the term vocabulary scales with the corpus;
- events keep their time horizon (10× density per day — the "more
  traffic, same retention window" scale-up).

Output: /root/repo/.scratch/sf1/*.parquet (gitignored, regenerable).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from airflow_crypto_etl_spark.session import get_spark
from airflow_crypto_etl_spark.sources.tables import load_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)
COPIES = 10
SHIFT = 1_000_000_000

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def scaled(df: DataFrame, keys: list[str], mangle_text: bool) -> DataFrame:
    parts = []
    for i in range(COPIES):
        p = df
        for k in keys:
            p = p.withColumn(k, F.col(k) + F.lit(i * SHIFT))
        if mangle_text and i > 0:
            p = p.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit(f"_c{i}")),
                    ),
                    " ",
                ),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark(app_name="aces-gen-sf1")
    os.makedirs(OUT, exist_ok=True)
    for name in COPY_AS_IS:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet")
        )
        print(f"{name}: copied")
    for name, keys in KEYS.items():
        df = load_table(spark, SRC, name)
        out = scaled(df, keys, mangle_text=(name == "documents"))
        files = 8 if name in ("lineitem", "orders", "events") else 4
        dest = os.path.join(OUT, f"{name}.parquet")
        if name == "events":
            # Replaying a historical lake as a STREAM requires
            # time-ordered replay: order-sensitive stateful folds (the
            # recursive EMA) assume arrival order == event order, and a
            # hash-partitioned layout replayed file-by-file delivers
            # timestamps out of order (found: q_stream_ema hash-mismatch
            # at sf1). Range-partition by ts so each part file is a
            # disjoint time slice (part index ascending in time) …
            out.repartitionByRange(files, "ts", "event_id").sortWithinPartitions(
                "ts", "event_id"
            ).write.mode("overwrite").parquet(dest)
            # … and stamp ascending mtimes in part order, because the
            # file stream source replays in modification-time order.
            import time as _time

            t0 = int(_time.time()) - 3600
            for j, fn in enumerate(
                sorted(f for f in os.listdir(dest) if f.endswith(".parquet"))
            ):
                os.utime(os.path.join(dest, fn), (t0 + j, t0 + j))
        else:
            out.coalesce(files).write.mode("overwrite").parquet(dest)
        print(f"{name}: x{COPIES}")
    spark.stop()


if __name__ == "__main__":
    main()
