"""Small-file compaction — the operational counterpart of the
scan-split sizing in session.py.

A 100 TB lake ingested incrementally (one file per micro-batch per
partition — exactly what plans/incremental.py produces) degrades into
millions of KB-sized files: every scan pays per-file open cost and the
driver pays listing cost. Compaction bin-packs a directory back to
target-sized files:

- output file count is computed from MEASURED input bytes, not row
  counts (rows/byte varies wildly across columns and encodings);
- the rewrite is a narrow coalesce when shrinking (no shuffle) and a
  round-robin repartition only when files must grow in number;
- the swap is write-new → move-old-out → move-new-in, the same
  read-visible promotion the reference hand-rolls for partitions
  (`/root/reference/dags/coin_data_pipeline_optimized.py:392-456`);
  on a transactional table format (Delta/Iceberg) this whole module
  collapses into OPTIMIZE / rewrite_data_files.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) for a local/posix parquet dir."""
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return total, n


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = 128, min_files_to_act: int = 4
) -> dict:
    """Compact a parquet directory to ~``target_mb`` files in place.

    Returns {"before_files", "after_files", "bytes", "skipped"}. No-op
    (skipped=True) when the directory is already within one file of its
    ideal count — compaction that rewrites everything to save one file
    is worse than the disease at scale.
    """
    total, n_files = dir_stats(path)
    want = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if n_files <= max(want, min_files_to_act - 1):
        return {"before_files": n_files, "after_files": n_files, "bytes": total, "skipped": True}

    df = spark.read.parquet(path)
    out = df.coalesce(want) if want < n_files else df.repartition(want)
    tmp_new = path.rstrip("/") + "__compact_new"
    tmp_old = path.rstrip("/") + "__compact_old"
    shutil.rmtree(tmp_new, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp_new)
    # read-visible swap (POSIX rename; object stores / table formats do
    # this with a metadata commit instead)
    os.rename(path, tmp_old)
    os.rename(tmp_new, path)
    shutil.rmtree(tmp_old, ignore_errors=True)
    _total2, n_after = dir_stats(path)
    return {"before_files": n_files, "after_files": n_after, "bytes": total, "skipped": False}
