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


def test_ticker_candles_end_to_end(spark):
    """Custom streaming source → OHLC candles, checked against a pure-
    python recomputation from the same deterministic quote function."""
    from collections import defaultdict

    from airflow_crypto_etl_spark.sources.ticker_stream import SYMBOLS, _quotes
    from airflow_crypto_etl_spark.streaming.windows import ticker_candles

    got = {
        (r.symbol, r.bucket): r for r in ticker_candles(spark, max_polls=36).collect()
    }
    # reference: 6 polls per hour (600s), bucket by poll // 6
    buckets = defaultdict(list)
    for p in range(36):
        for poll, sym, price in _quotes(p):
            buckets[(sym, p // 6)].append((p, round(price, 4)))
    assert len(got) == len(buckets)  # 5 symbols x 6 hours
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    for (sym, hb), ticks in buckets.items():
        bucket_ts = base + dt.timedelta(hours=hb)
        row = got[(sym, bucket_ts)]
        prices = [px for _, px in ticks]
        assert float(row.open) == prices[0]
        assert float(row.close) == prices[-1]
        assert float(row.high) == max(prices)
        assert float(row.low) == min(prices)
        assert row.n_trades == len(ticks)
