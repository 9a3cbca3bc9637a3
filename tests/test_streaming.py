"""Structured Streaming: the availableNow replay must agree with the
batch window operators over the same bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.queries_ext import q_window_tumbling
from airflow_crypto_etl_spark.streaming.windows import streaming_session, streaming_tumbling


def _key(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream_out = streaming_tumbling(spark, sf_dir)
    batch_out = q_window_tumbling(spark, sf_dir)
    s = _key(stream_out.collect(), ["window_start", "event_type", "n_events"])
    b = _key(batch_out.collect(), ["window_start", "event_type", "n_events"])
    assert s == b
    assert stream_out.count() > 0


def test_streaming_session_emits_sessions(spark, sf_dir):
    out = streaming_session(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["session_end"] > r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_is_incremental(spark, sf_dir):
    # the stream source plans per-file splits; a second availableNow run
    # over the same static input is deterministic
    a = streaming_tumbling(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    b = streaming_tumbling(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    assert a == b


def test_foreachbatch_parquet_sink_equals_batch(spark, sf_dir, tmp_path):
    from airflow_crypto_etl_spark.streaming.windows import stream_to_parquet
    from airflow_crypto_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = str(tmp_path / "out")
    stream_to_parquet(spark, sf_dir, out, str(tmp_path / "ckpt"))
    landed = spark.read.parquet(out)
    batch = load_table(spark, sf_dir, "events")
    assert landed.count() == batch.count()
    # value totals survive the stream → parquet round trip exactly
    s = landed.agg(F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0][0]
    b = batch.agg(F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0][0]
    assert s == b
    # partition layout is the medallion dt= shape
    import os
    assert any(d.startswith("event_date=") for d in os.listdir(out))


def test_streaming_ema_matches_pandas_reference(spark, sf_dir):
    """The stateful streaming EMA over the bounded replay must equal a
    single-process pandas ewm over the full per-symbol tick series —
    same kernel, so equality is exact, not approximate."""
    import pandas as pd

    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.stateful import EMA_PERIODS
    from airflow_crypto_etl_spark.streaming.windows import streaming_ema_per_symbol

    got = {r.symbol: r for r in streaming_ema_per_symbol(spark, sf_dir).collect()}

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value").toPandas()
    alpha = 2.0 / (EMA_PERIODS + 1.0)
    for sym, grp in ev.groupby("event_type"):
        grp = grp.sort_values(["ts", "event_id"])
        prices = grp["value"].round(4).astype("float64")  # PRICE_DEC quantization
        ref = prices.ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        assert got[sym].n_ticks == len(grp)
        assert got[sym].ema == ref
