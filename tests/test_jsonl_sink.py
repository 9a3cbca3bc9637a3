"""Custom Python DataSource writer: sharded JSONL sink with two-phase
commit — written rows must round-trip losslessly through spark.read.json
and the commit protocol must leave no tmp debris behind."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.sources.jsonl_sink import JsonlShardDataSource
from airflow_crypto_etl_spark.sources.tables import load_table


def _register(spark):
    try:
        spark.dataSource.register(JsonlShardDataSource)
    except Exception:
        pass  # already registered in this session


def test_jsonl_shard_roundtrip(spark, sf_dir, tmp_path):
    _register(spark)
    out = str(tmp_path / "shards")
    src = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .repartition(4)
    )
    src.write.format("jsonl_shard").option("path", out).mode("append").save()

    shards = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(shards) == 4
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.isdir(os.path.join(out, "_tmp"))
    with open(os.path.join(out, "_SUCCESS"), encoding="utf-8") as f:
        marker = json.load(f)
    n = src.count()
    assert marker["n_rows"] == n and marker["n_shards"] == 4

    back = spark.read.json(out)
    assert back.count() == n
    a = src.agg(F.sum("o_orderkey").alias("s")).collect()[0]["s"]
    b = back.agg(F.sum("o_orderkey").alias("s")).collect()[0]["s"]
    assert a == b


def test_jsonl_shard_overwrite_replaces(spark, sf_dir, tmp_path):
    _register(spark)
    out = str(tmp_path / "shards_ow")
    small = load_table(spark, sf_dir, "nation").repartition(2)
    small.write.format("jsonl_shard").option("path", out).mode("append").save()
    first = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    smaller = small.limit(3).repartition(1)
    smaller.write.format("jsonl_shard").option("path", out).mode(
        "overwrite"
    ).save()
    after = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert len(first) == 2 and len(after) == 1
    assert spark.read.json(out).count() == 3


def test_jsonl_shard_append_accumulates(spark, sf_dir, tmp_path):
    _register(spark)
    out = str(tmp_path / "shards_app")
    small = load_table(spark, sf_dir, "region").repartition(1)
    small.write.format("jsonl_shard").option("path", out).mode("append").save()
    small.write.format("jsonl_shard").option("path", out).mode("append").save()
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 2
    assert spark.read.json(out).count() == 2 * small.count()


def test_jsonl_shard_streaming_sink(spark, sf_dir, tmp_path):
    """Custom Python DataSource STREAM writer: availableNow replay of the
    event stream into batch-scoped shards; output must equal the batch
    event count and carry batchId-prefixed names (the idempotent
    re-publish key)."""
    from airflow_crypto_etl_spark.streaming.windows import stream_events

    _register(spark)
    out = str(tmp_path / "stream_shards")
    ckpt = str(tmp_path / "ckpt")
    ev = stream_events(spark, sf_dir).select("event_id", "user_id", "event_type")
    q = (
        ev.writeStream.format("jsonl_shard")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    parts = [f for f in os.listdir(out) if f.startswith("part-b")]
    assert parts, "no batch-scoped shards written"
    n = spark.read.json(out).count()
    assert n == load_table(spark, sf_dir, "events").count()
