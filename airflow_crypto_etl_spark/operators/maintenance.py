"""Lakehouse table-maintenance operators: file-level zone maps,
range-predicate file skipping, and small-file compaction planning.

At 100 TB a parquet lake is ~10^5–10^6 files; the operators here treat
the FILE-metadata relation (one row per file: path, bytes, row count,
per-column min/max) as the working set. That relation is ~10^2 bytes per
file — megabytes, not terabytes — so a total order over it (the
compaction first-fit) is a bounded driver-scale sort even at the largest
lakes, while everything that touches DATA rows (the stats scan itself)
stays a distributed partial aggregation.

Parity note: the reference has no compaction layer (its lake is a
MinIO bucket of per-day JSON/parquet dumps,
/root/reference/dags/coin_data_pipeline_optimized.py:292-331 writes one
object per ds) — this module is part of the beyond-reference scale
surface, alongside operators/layout.py (Z-order) and the partitioned
writers (sinks/writers.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["file_stats", "prunable_files", "compaction_plan"]


def file_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file zone maps for a parquet table: one row per physical file
    with its byte size, row count, and min/max of each column in ``cols``
    (the same footer statistics a lakehouse manifest keeps, but computed
    engine-side so they exist for ANY column, not just the writer's).

    One distributed scan, partial-agg combined per file — the output
    relation is metadata-sized (#files rows). Uses the ``_metadata``
    hidden column (file path + on-disk size), which Spark serves from
    the file index without reading data pages for those two fields.
    """
    df = spark.read.parquet(path)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.first("file_size").alias("file_bytes"),
    ]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_size"),
            *cols,
        )
        .groupBy("file_path")
        .agg(*aggs)
    )


def prunable_files(stats: DataFrame, col: str, lo, hi) -> DataFrame:
    """Which files a closed-range predicate ``lo <= col <= hi`` can skip,
    given :func:`file_stats` output: a file is prunable iff its zone map
    proves no row can match (max < lo or min > hi). Returns the stats
    rows tagged ``prunable`` plus the would-be scan cost columns — the
    decision a data-skipping reader makes per file, expressed as a
    DataFrame so it can be audited/joined at any lake size."""
    mn, mx = F.col(f"min_{col}"), F.col(f"max_{col}")
    return stats.withColumn(
        "prunable",
        # NULL-safe: a file whose zone map is all-NULL for `col` cannot
        # satisfy a range predicate, so it is prunable too.
        ((mx < F.lit(lo)) | (mn > F.lit(hi))) | (mn.isNull() & mx.isNull()),
    )


def compaction_plan(stats: DataFrame, target_bytes: int) -> DataFrame:
    """First-fit small-file compaction bins: walk files in path order,
    accumulate bytes, and cut a new output bin whenever the running sum
    crosses ``target_bytes`` — the plan an OPTIMIZE/rewrite job executes
    (each bin becomes one rewritten file of ~target size).

    The cumulative sum runs in ONE partition by design: the input is the
    file-METADATA relation (#files rows, bounded ~10^6 at 100 TB — see
    module docstring), not data rows, so a global ordered window here is
    a bounded sort, the same class as the histogram/life-table windows
    in the parity gate's bounded allowlist. Bin id is assigned so that a
    file that itself exceeds the target gets its own bin and never drags
    neighbours past 2x target (ceil-division fence on the PRIOR sum).
    """
    w = Window.orderBy("file_path").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("file_bytes").over(w)
    binned = stats.select(
        "file_path",
        "file_bytes",
        "n_rows",
        F.floor(((cum - F.col("file_bytes")).cast("double")) / F.lit(float(target_bytes)))
        .cast("bigint")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("file_bytes").alias("total_bytes"),
        F.sum("n_rows").alias("total_rows"),
        F.min("file_path").alias("first_file"),
        F.max("file_path").alias("last_file"),
    )
