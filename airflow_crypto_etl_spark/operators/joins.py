"""Join operators.

The reference has no explicit join; the star-schema split
(`coin_prices_fact` ⋈ `coin_dimension` on `coin_id`, DDL at
`/root/reference/dags/coin_data_pipeline_optimized.py:87-104`) exists
*so that* the warehouse can join at serving time (SURVEY.md §2.4). The
engine provides the full join surface Spark-first, with the physical
strategy chosen for scale:

- dimensions are **broadcast** (no shuffle of the 100 TB fact side);
- fact⋈fact equi-joins shuffle on the join key and rely on AQE for
  skew splitting;
- as-of / range joins (time-series, which the gold layer exists for)
  are composed from equi-join + window built-ins, never per-row UDFs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, str]], broadcast_dims: bool = True) -> DataFrame:
    """J1 — fact ⋈ dim* on equi-keys. Each dim is broadcast: at 100 TB the
    fact side must never shuffle for a dimension lookup."""
    out = fact
    for dim, key in dims:
        out = out.join(F.broadcast(dim) if broadcast_dims else dim, key, "inner")
    return out


def reconcile_counts(src: DataFrame, dst: DataFrame) -> DataFrame:
    """J2 — cross-system count reconciliation
    (`…optimized.py:996-1046`): one row (src_rows, dst_rows, counts_match).
    Generalization of the reference's MinIO-vs-Postgres gate."""
    a = src.agg(F.count(F.lit(1)).alias("src_rows"))
    b = dst.agg(F.count(F.lit(1)).alias("dst_rows"))
    return a.crossJoin(b).withColumn("counts_match", F.col("src_rows") == F.col("dst_rows"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (backward) within the same ``on`` key.

    Spark lacks a native ASOF JOIN; composition: equi-join on the key
    with the range predicate, then keep the max-ts right match per left
    row via a window. The equi-join keeps the shuffle keyed on ``on``
    (co-partitioned both sides); the window re-uses that partitioning, so
    AQE sees one shuffle. For very hot keys, pre-bucket both sides on
    ``on``. (Alternative at extreme skew: ``applyInPandas`` +
    ``pd.merge_asof`` per key-group.)
    """
    cmp_ok = F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}") if direction == "backward" else (
        F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}")
    )
    order = F.col(f"__r.{right_ts}").desc() if direction == "backward" else F.col(f"__r.{right_ts}").asc()
    l, r = left.alias("__l"), right.alias("__r")
    joined = l.join(r, (F.col(f"__l.{on}") == F.col(f"__r.{on}")) & cmp_ok, "inner")
    w = Window.partitionBy(*[F.col(f"__l.{c}") for c in left.columns]).orderBy(order)
    out = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    keep = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    keep += [F.col(f"__r.{c}").alias(f"r_{c}") for c in right_cols]
    return out.select(*keep)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: the (large, skewed) left side gets a
    deterministic salt in [0, salt); the right side is replicated ×salt;
    the join key becomes (key, salt), splitting each hot key's rows
    across ``salt`` reducers.

    The salt must be uncorrelated with the key but deterministic for
    re-run stability — derived by hashing the left row's key together
    with a per-row discriminator via xxhash64. AQE's skew-join handles
    moderate skew automatically; explicit salting is for the pathological
    key whose single value exceeds a task's memory.
    """
    disc = F.spark_partition_id() * F.lit(1_000_003) + F.monotonically_increasing_id() % 1_000_003
    l = left.withColumn("__salt", F.pmod(F.xxhash64(F.col(key), disc), F.lit(salt)))
    r = right.crossJoin(
        F.broadcast(right.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt")))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def bucketed_tables(
    dfs: dict[str, DataFrame], key: str, n_buckets: int = 16, overwrite: bool = True
) -> None:
    """Persist DataFrames as bucketed+sorted tables on the join key so
    later equi-joins on that key are exchange-free (co-located):
    `SortMergeJoin` over pre-bucketed scans with zero shuffle. This is
    the 100 TB answer for repeated fact⋈fact joins — pay the shuffle
    once at write time, never at query time."""
    for name, df in dfs.items():
        if overwrite:
            spark = df.sparkSession
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            # a PREVIOUS session may have left the managed location on
            # disk without a catalog entry — saveAsTable refuses that
            # (LOCATION_ALREADY_EXISTS); clear the orphan.
            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            loc = os.path.join(wh.removeprefix("file:"), name.lower())
            shutil.rmtree(loc, ignore_errors=True)
        writer = (
            df.write.mode("overwrite" if overwrite else "error")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
        )
        writer.saveAsTable(name)


def range_join(facts: DataFrame, buckets: DataFrame, value_col: str, lo_col: str, hi_col: str) -> DataFrame:
    """Range (band) join: assign each fact row to the bucket whose
    [lo, hi) interval contains ``value_col``. The bucket table is small by
    construction → broadcast, so the range predicate is evaluated
    map-side with zero shuffle."""
    cond = (facts[value_col] >= buckets[lo_col]) & (facts[value_col] < buckets[hi_col])
    return facts.join(F.broadcast(buckets), cond, "inner")
