"""Incremental medallion: Bronze → Silver as a checkpointed stream.

The reference models incremental arrival as one ``dt=`` partition per
daily Airflow run, with re-run idempotency by partition overwrite
(`/root/reference/dags/coin_data_pipeline_optimized.py:53-60,392-456`
and README "clear failed tasks and re-run"). The Spark-native form of
that contract (SURVEY.md §2.10) is a FILE STREAM over the Bronze tree
with ``trigger(availableNow=True)``:

- the checkpoint replaces Airflow task state — each file is processed
  exactly once across any number of invocations, so "run the DAG
  again" becomes "call the function again" and only NEW bronze files
  do work;
- the Silver transform/contract is the SAME batch code (silver_
  transform), applied inside foreachBatch, which also keeps the
  partitioned-parquet sink and its dt= layout;
- late/re-delivered partitions need no special casing: a re-dropped
  bronze file is a new file to the source, and dynamic partition
  overwrite in the sink keeps the result idempotent at the partition
  grain.

Scale: the file source lists incrementally (maxFilesPerTrigger bounds
per-batch work), the transform is narrow, and state is just the file
log — this is the shape that ingests a 100 TB backlog one bounded
micro-batch at a time instead of one giant job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import apply_runtime_confs
from .medallion import silver_transform

# Bronze is schema-on-read for batch, but a stream source must declare
# its schema up front — the 6 contract inputs plus the partition column.
BRONZE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("current_price", T.DoubleType()),
        T.StructField("market_cap", T.DoubleType()),
        T.StructField("last_updated", T.StringType()),
    ]
)


def incremental_silver(
    spark: SparkSession,
    lake_root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> int:
    """Process every not-yet-seen Bronze file into Silver, exactly once.

    Returns the number of rows written this invocation (0 on a no-op
    re-run — the idempotency the reference gets from partition
    overwrite, here from the checkpoint's file log).
    """
    apply_runtime_confs(spark)
    bronze_path = os.path.join(lake_root, "bronze", "coins")
    reader = spark.readStream.schema(BRONZE_STREAM_SCHEMA).option("multiLine", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    bronze = reader.json(bronze_path)

    written = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent at the BATCH grain: output partitioned by batch_id
        # with dynamic partition overwrite, so a crash between this
        # write and the checkpoint offset commit replays the batch into
        # the SAME partition instead of appending duplicates (round-1
        # ADVICE: plain append broke the module's exactly-once claim).
        silver = silver_transform(batch_df).withColumn("batch_id", F.lit(batch_id))
        out = os.path.join(lake_root, "silver_incremental", "coins")
        (
            silver.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out)
        )
        written["n"] += silver.count()

    q = (
        bronze.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return written["n"]
