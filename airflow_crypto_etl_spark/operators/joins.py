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
    strategy: str = "merge",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (backward) within the same ``on`` key;
    inner semantics (left rows without a match are dropped), matching
    DuckDB/pandas ASOF JOIN.

    Spark lacks a native ASOF JOIN; two compositions:

    - ``strategy="merge"`` (default, the 100 TB path): cogroup both
      sides on ``on`` and run ``pd.merge_asof`` per key group via
      ``applyInPandas``. Exactly ONE shuffle per input, keyed on
      ``on``, and the (left × prior-right) candidate pairs are NEVER
      materialized — per-group cost is the sort-merge O(n log n), not
      O(pairs). Arrow-batched, not per-row Python.
    - ``strategy="pairs"`` (JVM-only alternative): equi-join on ``on``
      with the range predicate, then collapse to the best match per
      left row with ``max_by`` keyed on a synthesized unique row id.
      The partial (map-side) aggregation collapses each left row's
      matches inside the join stage, so the second exchange moves only
      ~|left| rows — but the join still *enumerates* every candidate
      pair, which a hot key can make quadratic. Use for small/cold
      keys when staying JVM-side wins.
    """
    if strategy == "merge":
        return _asof_merge(left, right, on, left_ts, right_ts, right_cols, direction)
    if strategy != "pairs":
        raise ValueError(f"unknown asof strategy: {strategy!r}")
    cmp_ok = F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}") if direction == "backward" else (
        F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}")
    )
    pick = F.max_by if direction == "backward" else F.min_by
    l = left.withColumn("__lid", F.monotonically_increasing_id()).alias("__l")
    r = right.alias("__r")
    joined = l.join(r, (F.col(f"__l.{on}") == F.col(f"__r.{on}")) & cmp_ok, "inner")
    picked = joined.groupBy(F.col("__l.__lid").alias("__lid")).agg(
        # left columns are constant within a __lid group, so first() is
        # deterministic here despite its general order-dependence
        *[F.first(F.col(f"__l.{c}")).alias(c) for c in left.columns],
        *[pick(F.col(f"__r.{c}"), F.col(f"__r.{right_ts}")).alias(f"r_{c}") for c in right_cols],
    )
    return picked.select(*left.columns, *[f"r_{c}" for c in right_cols])


def _asof_merge(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str,
) -> DataFrame:
    """Cogrouped ``pd.merge_asof`` kernel (see ``asof_join``)."""
    import pandas as pd
    from pyspark.sql import types as T

    r_keep = list(dict.fromkeys([right_ts, *right_cols]))  # ts needed for the merge key
    # NULL timestamps: the pairs path drops them via the range predicate
    # (inner semantics); pd.merge_asof would instead raise on null merge
    # keys — filter both sides up front so the strategies agree.
    left = left.filter(F.col(left_ts).isNotNull() & F.col(on).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull() & F.col(on).isNotNull())
    # Alias-rename EVERY right column (fresh exprIds): when both sides
    # share lineage (e.g. two filters of one events scan), Spark's
    # self-cogroup dedup collapses right attributes that carry the same
    # name as left ones, and the right pandas frame arrives without them.
    right_slim = right.select(
        F.col(on).alias("__r_on"), *[F.col(c).alias(f"__m_{c}") for c in r_keep]
    )
    out_fields = list(left.schema.fields) + [
        T.StructField(f"r_{c}", right_slim.schema[f"__m_{c}"].dataType, True) for c in right_cols
    ]
    schema = T.StructType(out_fields)
    l_cols = list(left.columns)
    match_col = f"__m_{right_ts}"

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        rr = rpdf[[f"__m_{c}" for c in r_keep]].sort_values(match_col)
        ll = lpdf.sort_values(left_ts)
        m = pd.merge_asof(
            ll, rr, left_on=left_ts, right_on=match_col, direction=direction
        )
        m = m[m[match_col].notna()]  # inner asof semantics
        out = m[l_cols].copy()
        for c in right_cols:
            out[f"r_{c}"] = m[f"__m_{c}"]
        return out

    return (
        left.groupBy(on)
        .cogroup(right_slim.groupBy("__r_on"))
        .applyInPandas(merge, schema=schema)
    )


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


# ---------------------------------------------------------------------------
# Portable bloom filter (broadcast probe-side pre-filter)
# ---------------------------------------------------------------------------

BLOOM_BITS_LOG2 = 16  # m = 65536 bits = 2048 32-bit words
# 32-bit words: bit 31 max keeps every mask positive in BIGINT on both
# engines (DuckDB errors on 1<<63; Spark shiftright sign-extends)
BLOOM_K = 3


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Build a bloom filter over a key column as (word_idx, mask) rows:
    k affine-hash positions per key, OR-folded into 32-bit words by ONE
    partial-agg groupBy (≤ 1024 result rows regardless of key count —
    broadcastable by construction). Engine-portable integer hashing, so
    the filter bits are deterministic and SQL-reproducible — unlike
    Spark's runtime BloomFilterAggregate (covered conf-side by
    test_runtime_bloom_filter_injected), this one is an explicit,
    inspectable operator."""
    from ..functions.hashing import affine_hash

    m = 1 << BLOOM_BITS_LOG2
    ks = keys.select(F.col(key_col).alias("k")).distinct()
    pos = ks.select(
        F.explode(
            F.array(
                *[
                    (affine_hash(F.col("k"), F.lit(j)) % F.lit(m)).alias(f"p{j}")
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            # SQL-expression shifts: the Python shiftleft/shiftright
            # helpers only accept literal shift amounts
            F.expr("shiftright(pos, 5)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )


def bloom_probe(probe: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Test each distinct probe key against the broadcast bloom words:
    a key passes iff ALL k bits are set (missing word = bit absent).
    Adds ``bloom_pass``; at scale this runs as a map-side broadcast
    join before the expensive exact join, discarding most non-matching
    rows for the cost of a hash per row."""
    from ..functions.hashing import affine_hash

    m = 1 << BLOOM_BITS_LOG2
    ks = probe.select(F.col(key_col).alias("k")).distinct()
    pos = ks.select(
        "k",
        F.posexplode(
            F.array(
                *[
                    (affine_hash(F.col("k"), F.lit(j)) % F.lit(m))
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("j", "pos"),
    )
    tested = (
        pos.select(
            "k",
            F.expr("shiftright(pos, 5)").alias("word_idx"),
            (F.col("pos") % 32).cast("int").alias("bit_idx"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .select(
            "k",
            (
                F.expr(
                    "shiftright(coalesce(mask, CAST(0 AS BIGINT)), bit_idx) & 1"
                )
                == F.lit(1)
            ).alias("hit"),
        )
    )
    return tested.groupBy("k").agg(F.min("hit").alias("bloom_pass"))
