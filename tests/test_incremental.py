"""Incremental Bronze→Silver: exactly-once file processing across
invocations (checkpoint = Airflow task state), no-op re-runs, and
delta-only processing when new partitions land."""

from __future__ import annotations

import json
import os

from reference_lake import bronze_records

from airflow_crypto_etl_spark.plans import incremental


def _drop_bronze(lake: str, ds: str, records: list[dict]) -> None:
    d = os.path.join(lake, "bronze", "coins", f"dt={ds}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "coin_raw.json"), "w") as f:
        json.dump(records, f)


def test_incremental_silver_exactly_once(spark, tmp_path):
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    day1 = bronze_records("2026-01-13")
    _drop_bronze(lake, "2026-01-13", day1)

    n1 = incremental.incremental_silver(spark, lake, ckpt)
    assert n1 == len(day1)
    out = os.path.join(lake, "silver_incremental", "coins")
    assert spark.read.parquet(out).count() == len(day1)

    # re-run with nothing new: checkpoint makes it a no-op
    assert incremental.incremental_silver(spark, lake, ckpt) == 0
    assert spark.read.parquet(out).count() == len(day1)

    # a new partition lands: only the delta is processed
    day2 = [{**r, "id": r["id"] + "_d2"} for r in bronze_records("2026-01-10")]
    _drop_bronze(lake, "2026-01-10", day2)
    n3 = incremental.incremental_silver(spark, lake, ckpt)
    assert n3 == len(day2)
    silver = spark.read.parquet(out)
    assert silver.count() == len(day1) + len(day2)
    # the silver contract survived the streaming path (+ the batch_id
    # partition column that makes crash-replay idempotent)
    assert set(silver.columns) == {
        "coin_id", "symbol", "name", "price_usd", "market_cap", "timestamp", "batch_id",
    }
    assert silver.filter("coin_id IS NULL OR price_usd IS NULL").count() == 0


def test_incremental_silver_batch_replay_idempotent(spark, tmp_path):
    """Crash between the parquet write and the checkpoint offset commit
    replays the batch; the batch_id-partitioned dynamic overwrite must
    re-land it in place, not duplicate it (round-1 ADVICE)."""
    import shutil

    lake = str(tmp_path / "lake")
    day1 = bronze_records("2026-01-13")
    _drop_bronze(lake, "2026-01-13", day1)

    ckpt1 = str(tmp_path / "ckpt1")
    n1 = incremental.incremental_silver(spark, lake, ckpt1)
    out = os.path.join(lake, "silver_incremental", "coins")
    assert spark.read.parquet(out).count() == n1

    # simulate the lost-commit crash: wipe the checkpoint so the same
    # files replay as batch 0 again into the already-written sink
    shutil.rmtree(ckpt1)
    ckpt2 = str(tmp_path / "ckpt2")
    n2 = incremental.incremental_silver(spark, lake, ckpt2)
    assert n2 == n1
    assert spark.read.parquet(out).count() == n1  # overwritten, not appended
