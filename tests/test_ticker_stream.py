"""Custom streaming DataSource: offset-ranged deterministic polls,
exactly-once across restarts via the checkpoint."""

from __future__ import annotations

import pytest

from airflow_crypto_etl_spark.sources import ticker_stream as ts


@pytest.mark.skipif(ts.TickerDataSource is None, reason="needs PySpark 4 DataSource API")
def test_ticker_stream_bounded_replay(spark, tmp_path):
    assert ts.register_ticker_source(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("ticker")
        .option("maxPolls", 7)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # drains in POLLS_PER_BATCH-sized micro-batches (3+3+1) until the
    # source goes idle at maxPolls — exercises offset advancement
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    # 7 polls × 5 symbols, deterministic values
    assert got.count() == 7 * len(ts.SYMBOLS)
    first = {(r["poll"], r["symbol"]): r["price"] for r in got.collect()}
    assert first[(0, "btc")] == ts._quotes(0)[0][2]

    # restart with the same checkpoint: no new offsets → nothing new
    q2 = (
        spark.readStream.format("ticker")
        .option("maxPolls", 7)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == 7 * len(ts.SYMBOLS)
