"""Invariant tests for the market time-series battery
(operators/timeseries.py, queries_market.py). Exact cross-engine value
parity is covered by test_oracle_parity; these tests pin the SEMANTIC
invariants the oracle comparison can't see (candle ordering bounds,
interpolation monotonicity, baseline exclusion) on hand-built frames
where the expected numbers are computable by eye.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import timeseries as ts


def _tick_df(spark, rows):
    """rows: (symbol, ts_str, tick_id, price, volume)"""
    return spark.createDataFrame(
        [
            (s, dt.datetime.fromisoformat(t), int(i), float(p), int(v))
            for s, t, i, p, v in rows
        ],
        "symbol string, tick_ts timestamp, tick_id long, price_raw double, volume long",
    ).select(
        "symbol",
        F.date_trunc("hour", "tick_ts").alias("bucket"),
        "tick_ts",
        "tick_id",
        F.col("price_raw").cast(ts.PRICE_DEC).alias("price"),
        "volume",
    )


def test_ohlc_open_close_follow_time_not_value(spark):
    # open is the EARLIEST tick's price even though it is neither min
    # nor max; tick_id breaks the deliberate timestamp tie at 10:30.
    t = _tick_df(
        spark,
        [
            ("btc", "2024-01-01T10:00:00", 1, 50.0, 2),
            ("btc", "2024-01-01T10:15:00", 2, 99.0, 1),
            ("btc", "2024-01-01T10:30:00", 3, 10.0, 1),
            ("btc", "2024-01-01T10:30:00", 4, 70.0, 3),
        ],
    )
    row = ts.ohlc(t).collect()[0]
    assert float(row.open) == 50.0
    assert float(row.high) == 99.0
    assert float(row.low) == 10.0
    assert float(row.close) == 70.0  # tie on ts → higher tick_id wins max(struct)
    assert row.volume == 7
    assert row.n_trades == 4
    # vwap = (50*2 + 99*1 + 10*1 + 70*3) / 7
    assert row.vwap == pytest.approx((100 + 99 + 10 + 210) / 7, abs=1e-6)


def test_ohlc_candle_bounds_on_real_data(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_market import q_ohlc_candles

    rows = q_ohlc_candles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert float(r.low) <= float(r.open) <= float(r.high)
        assert float(r.low) <= float(r.close) <= float(r.high)
        assert float(r.low) - 1e-9 <= r.vwap <= float(r.high) + 1e-9
        assert r.n_trades >= 1


def test_sma_flat_series_equals_price(spark):
    rows = [("eth", f"2024-01-01T{h:02d}:30:00", h, 25.0, 1) for h in range(24)]
    out = ts.sma_crossover(ts.hourly_close(_tick_df(spark, rows)), fast=3, slow=6).collect()
    assert len(out) == 24 - 5  # full slow frames only
    for r in out:
        assert r.sma_fast == pytest.approx(25.0)
        assert r.sma_slow == pytest.approx(25.0)
        assert r.golden == 0  # equal SMAs are not a golden cross


def test_rsi_extremes(spark):
    # strictly rising closes → RSI 100; strictly falling → RSI 0
    up = [("up", f"2024-01-01T{h:02d}:00:00", h, 10.0 + h, 1) for h in range(20)]
    down = [("dn", f"2024-01-01T{h:02d}:00:00", h, 50.0 - h, 1) for h in range(20)]
    out = {
        (r.symbol, r.bucket): r
        for r in ts.rsi_cutler(
            ts.hourly_close(_tick_df(spark, up + down)), periods=14
        ).collect()
    }
    assert out
    for (sym, _), r in out.items():
        assert r.rsi == pytest.approx(100.0 if sym == "up" else 0.0)


def test_bollinger_flat_series_bands_collapse(spark):
    rows = [
        ("ada", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 7.5, 1) for h in range(25)
    ]
    out = ts.bollinger(ts.hourly_close(_tick_df(spark, rows)), periods=20).collect()
    assert out
    for r in out:
        assert r.mid == pytest.approx(7.5)
        assert r.upper == pytest.approx(7.5)
        assert r.lower == pytest.approx(7.5)


def test_gapfill_linear_interpolation_exact(spark):
    # closes at hour 0 (10.0) and hour 4 (30.0); hours 1-3 are gaps →
    # interpolated 15, 20, 25.
    rows = [
        ("sol", "2024-01-01T00:10:00", 1, 10.0, 1),
        ("sol", "2024-01-01T04:20:00", 2, 30.0, 1),
    ]
    out = sorted(
        ts.gapfill_linear(ts.hourly_close(_tick_df(spark, rows))).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.is_gap for r in out] == [0, 1, 1, 1, 0]
    assert [r.px for r in out] == pytest.approx([10.0, 15.0, 20.0, 25.0, 30.0])


def test_gapfill_edges_extend_nearest(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_market import q_gapfill_interp

    out = q_gapfill_interp(spark, sf_dir)
    assert out.filter(F.col("px").isNull()).count() == 0
    # spine is dense: per symbol, row count == span hours + 1
    spans = (
        out.groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                (F.unix_timestamp(F.max("bucket").cast("timestamp"))
                 - F.unix_timestamp(F.min("bucket").cast("timestamp"))) / 3600 + 1
            ).cast("long").alias("expect"),
        )
        .collect()
    )
    for r in spans:
        assert r.n == r.expect


def test_zscore_excludes_current_row_from_baseline(spark):
    # 30 flat hours then a spike: the spike's own hour must not inflate
    # its baseline, so sd stays 0-free and z is well-defined and large.
    rows = [("btc", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 5.0, 1) for h in range(30)]
    counts = (
        ts.with_market_cols(
            _tick_df(spark, rows).select(
                F.col("tick_ts").alias("ts"),
                F.col("tick_id").alias("event_id"),
                F.col("symbol").alias("event_type"),
                F.col("price").cast("double").alias("value"),
            )
        )
        .groupBy("symbol", "bucket")
        .count()
        .withColumnRenamed("count", "n_ticks")
    )
    # make hour 29 a spike of 5 ticks by unioning 4 extra rows
    spike = counts.withColumn(
        "n_ticks", F.when(F.col("bucket") == dt.datetime(2024, 1, 2, 5), F.lit(5)).otherwise(F.col("n_ticks"))
    )
    out = ts.rolling_zscore(spike, "n_ticks", trailing=24).collect()
    by_bucket = {r.bucket: r for r in out}
    spike_row = by_bucket[dt.datetime(2024, 1, 2, 5)]
    # baseline is the 24 flat hours before it: mu == 1.0, z is NULL only
    # if sd == 0 — which it is here (flat baseline), so z is None...
    assert spike_row.mu == pytest.approx(1.0)
    assert spike_row.z is None  # flat baseline: sd == 0 → z undefined, not inf
    # ...and a non-degenerate baseline yields a finite z on real data
    from airflow_crypto_etl_spark.queries_market import q_anomaly_zscore

    assert q_anomaly_zscore(spark, SF_DIR_FALLBACK).filter(F.col("z").isNotNull()).count() > 0


SF_DIR_FALLBACK = "/root/testdata/sf0.001"


def test_drawdown_running_peak(spark):
    rows = [
        ("btc", "2024-01-01T00:00:00", 1, 100.0, 1),
        ("btc", "2024-01-01T01:00:00", 2, 80.0, 1),
        ("btc", "2024-01-01T02:00:00", 3, 120.0, 1),
        ("btc", "2024-01-01T03:00:00", 4, 90.0, 1),
    ]
    out = sorted(
        ts.drawdown(ts.hourly_close(_tick_df(spark, rows))).collect(),
        key=lambda r: r.bucket,
    )
    assert [float(r.peak) for r in out] == [100.0, 100.0, 120.0, 120.0]
    assert [r.dd for r in out] == pytest.approx([0.0, 0.2, 0.0, 0.25])


def test_ema_flat_series_equals_price(spark):
    rows = [
        ("eth", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 40.0, 1)
        for h in range(35)
    ]
    out = ts.ema_fir(ts.hourly_close(_tick_df(spark, rows)), periods=10, taps=30).collect()
    assert len(out) == 35 - 29
    for r in out:
        assert r.ema == pytest.approx(40.0)


def test_ema_weights_normalized_and_decreasing(spark):
    ws, den = ts.ema_fir_weights(10, 30)
    assert len(ws) == 30
    assert all(a > b for a, b in zip(ws, ws[1:]))
    assert den == pytest.approx(1.0 - (1.0 - 2.0 / 11.0) ** 30)


def test_daily_movers_rank_and_k(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_market import _MOVERS_K, q_daily_movers

    rows = q_daily_movers(spark, sf_dir).collect()
    assert rows
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r.bucket, []).append(r)
    for day, rs in by_day.items():
        rs.sort(key=lambda r: r.mrank)
        assert 1 <= len(rs) <= _MOVERS_K
        assert [r.mrank for r in rs] == list(range(1, len(rs) + 1))
        pcts = [r.pct for r in rs]
        assert pcts == sorted(pcts, reverse=True)


def test_corr_pairs_bounds_and_identity(spark):
    # xb = 2*xa + 1 exactly → corr 1, beta 2; xc anti-correlated → corr -1
    rows = []
    for h in range(10):
        t = f"2024-01-01T{h:02d}:00:00"
        rows += [
            ("aaa", t, 3 * h, float(10 + h), 1),
            ("bbb", t, 3 * h + 1, float(2 * (10 + h) + 1), 1),
            ("ccc", t, 3 * h + 2, float(100 - h), 1),
        ]
    out = {
        (r.sym_a, r.sym_b): r
        for r in ts.pairwise_corr(ts.hourly_close(_tick_df(spark, rows))).collect()
    }
    assert set(out) == {("aaa", "bbb"), ("aaa", "ccc"), ("bbb", "ccc")}
    assert out[("aaa", "bbb")].corr == pytest.approx(1.0)
    assert out[("aaa", "bbb")].beta == pytest.approx(2.0)
    assert out[("aaa", "ccc")].corr == pytest.approx(-1.0)
    for r in out.values():
        assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
        assert r.n == 10


def test_backtest_always_long_on_rising_series(spark):
    # strictly rising closes → golden from the first retained bar, so
    # the strategy is long every bar: cum_pnl at T == close_T - close
    # at the first bar where a position exists minus one step
    rows = [
        ("btc", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 100.0 + h, 1)
        for h in range(30)
    ]
    out = sorted(
        ts.backtest_crossover(ts.hourly_close(_tick_df(spark, rows)), fast=3, slow=6).collect(),
        key=lambda r: r.bucket,
    )
    assert out
    assert all(r.pos == 1 for r in out)
    assert all(float(r.pnl) == pytest.approx(1.0) for r in out)
    assert float(out[-1].cum_pnl) == pytest.approx(len(out) * 1.0)


def test_backtest_flat_when_no_signal(spark):
    # strictly falling closes → fast SMA below slow → never long → zero PnL
    rows = [
        ("dn", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 500.0 - h, 1)
        for h in range(30)
    ]
    out = ts.backtest_crossover(ts.hourly_close(_tick_df(spark, rows)), fast=3, slow=6).collect()
    assert out
    assert all(r.pos == 0 for r in out)
    assert all(float(r.cum_pnl) == 0.0 for r in out)


def test_candle_rollup_equals_direct_computation(spark, sf_dir):
    """Algebraic law: 4h candles merged from hourly partials must equal
    4h candles computed directly from the ticks — partial-aggregate
    mergeability is what makes the continuous-aggregate maintenance
    shape correct."""
    from airflow_crypto_etl_spark.queries import _t

    ev = _t(spark, sf_dir, "events")
    hourly = ts.ohlc(ts.with_market_cols(ev), keep_pv=True)
    rolled = {
        (r.symbol, r.bucket): r for r in ts.ohlc_rollup(hourly, 14400).collect()
    }
    # direct: bucket ticks straight into 4h windows
    direct_ticks = ts.with_market_cols(ev).withColumn(
        "bucket",
        F.timestamp_seconds(
            (F.unix_timestamp(F.col("bucket").cast("timestamp")) / 14400).cast("bigint") * 14400
        ),
    )
    direct = {(r.symbol, r.bucket): r for r in ts.ohlc(direct_ticks).collect()}
    assert rolled.keys() == direct.keys()
    for k, r in rolled.items():
        d = direct[k]
        assert (float(r.open), float(r.high), float(r.low), float(r.close)) == (
            float(d.open), float(d.high), float(d.low), float(d.close)
        )
        assert (r.volume, r.n_trades) == (d.volume, d.n_trades)
        assert r.vwap == d.vwap  # lossless: both divide the same exact pv sum


def test_merge_candles_associative_across_batch_splits(spark, sf_dir):
    """Incremental maintenance law: splitting the ticks into batches by
    ANY predicate and merging the per-batch candle partials must equal
    the candles computed over all ticks at once — exact equality
    including VWAP (same pv sums) and the re-elected open/close."""
    from airflow_crypto_etl_spark.queries import _t

    ev = _t(spark, sf_dir, "events")
    ticks = ts.with_market_cols(ev)
    full = {(r.symbol, r.bucket): r for r in ts.ohlc(ticks).collect()}

    # split mid-hour so many buckets straddle both batches
    a = ts.ohlc(ticks.filter(F.col("tick_id") % 3 != 0), mergeable=True)
    b = ts.ohlc(ticks.filter(F.col("tick_id") % 3 == 0), mergeable=True)
    merged = {(r.symbol, r.bucket): r for r in ts.merge_candles(a, b).collect()}

    assert merged.keys() == full.keys()
    for k, m in merged.items():
        f = full[k]
        assert (float(m.open), float(m.high), float(m.low), float(m.close)) == (
            float(f.open), float(f.high), float(f.low), float(f.close)
        )
        assert (m.volume, m.n_trades, m.vwap) == (f.volume, f.n_trades, f.vwap)


def test_candle_gold_publish_roundtrip(spark, sf_dir, tmp_path):
    """Gold-layer publish of the candle table through the engine's
    partitioned writer + sidecar (the reference's daily publish shape):
    dynamic-overwrite by trade date, row-count sidecar captured during
    the write, lossless read-back."""
    from airflow_crypto_etl_spark.queries import _t
    from airflow_crypto_etl_spark.sinks.writers import read_sidecar, write_with_sidecar

    candles = ts.ohlc(ts.with_market_cols(_t(spark, sf_dir, "events"))).withColumn(
        "dt", F.to_date("bucket")
    )
    n = candles.count()
    path = str(tmp_path / "gold_candles")
    meta = write_with_sidecar(candles, path, ["dt"], dataset="gold_candles", source="events")
    assert meta["row_count"] == n
    back = spark.read.parquet(path)
    assert back.count() == n
    assert read_sidecar(path)["row_count"] == n
    # per-candle equality after the partitioned round-trip
    key = ["symbol", "bucket"]
    a = {tuple(r[k] for k in key): r.vwap for r in candles.collect()}
    b = {tuple(r[k] for k in key): r.vwap for r in back.collect()}
    assert a == b


def test_autocorr_linear_trend_is_one(spark):
    # a perfect linear trend is an exact affine map of its own lag →
    # ACF 1.0 at every lag
    rows = [
        ("lin", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 10.0 + 2 * h, 1)
        for h in range(30)
    ]
    out = ts.autocorr(ts.hourly_close(_tick_df(spark, rows)), lags=(1, 2, 3)).collect()
    assert len(out) == 3
    for r in out:
        assert r.acf == pytest.approx(1.0)
        assert r.n == 30 - r.lag


def test_market_ops_on_empty_and_singleton_inputs(spark):
    """Degenerate inputs must flow through every operator without
    error: empty tick set → empty outputs; a single tick → one candle
    whose OHLC collapse to the tick, and indicator outputs empty
    (frames never fill)."""
    empty = _tick_df(spark, [])
    one = _tick_df(spark, [("btc", "2024-01-01T00:00:00", 1, 42.0, 3)])

    for ticks, n_candles in ((empty, 0), (one, 1)):
        closes = ts.hourly_close(ticks)
        assert ts.ohlc(ticks).count() == n_candles
        assert ts.sma_crossover(closes).count() == 0
        assert ts.rsi_cutler(closes).count() == 0
        assert ts.bollinger(closes).count() == 0
        assert ts.ema_fir(closes).count() == 0
        assert ts.gapfill_linear(closes).count() == n_candles
        assert ts.autocorr(closes).count() == 0
        assert ts.pairwise_corr(closes).count() == 0
        assert ts.backtest_crossover(closes).count() == 0

    row = ts.ohlc(one).collect()[0]
    assert float(row.open) == float(row.high) == float(row.low) == float(row.close) == 42.0
    assert row.vwap == pytest.approx(42.0)
    g = ts.gapfill_linear(ts.hourly_close(one)).collect()[0]
    assert g.is_gap == 0 and g.px == pytest.approx(42.0)


def test_zero_guards_return_null_not_error(spark):
    """ANSI-mode hardening (review findings): zero volume, zero peak,
    and huge volumes must produce NULL metrics / correct sums, never an
    ArithmeticException."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # volume column present → passed through, including 0 and >= 10^8
    ticks = spark.createDataFrame(
        [
            ("btc", base, 1, 10.0, 0),
            ("btc", base + dt.timedelta(minutes=5), 2, 20.0, 0),
            ("eth", base, 3, 5.0, 200_000_000),
            ("eth", base + dt.timedelta(minutes=5), 4, 15.0, 100_000_000),
        ],
        "event_type string, ts timestamp, event_id long, value double, volume long",
    )
    rows = {r.symbol: r for r in ts.ohlc(ts.with_market_cols(ticks)).collect()}
    assert rows["btc"].volume == 0 and rows["btc"].vwap is None
    assert rows["eth"].volume == 300_000_000
    assert rows["eth"].vwap == pytest.approx(
        (5.0 * 2e8 + 15.0 * 1e8) / 3e8
    )
    # zero first close → NULL drawdown, not a crash
    zero_close = _tick_df(spark, [("z", "2024-01-01T00:00:00", 1, 0.0, 1),
                                  ("z", "2024-01-01T01:00:00", 2, 4.0, 1)])
    dd = sorted(ts.drawdown(ts.hourly_close(zero_close)).collect(), key=lambda r: r.bucket)
    assert dd[0].dd is None
    assert dd[1].dd == pytest.approx(0.0)


def test_rollup_floors_negative_epochs(spark):
    # pre-1970 candle must land in the 4h bucket STARTING BEFORE it
    import datetime as dt

    t = _tick_df(spark, [("old", "1969-12-31T23:30:00", 1, 9.0, 1)])
    hourly = ts.ohlc(t, keep_pv=True)
    r = ts.ohlc_rollup(hourly, 14400).collect()[0]
    assert r.bucket == dt.datetime(1969, 12, 31, 20, 0)


def test_rolling_median_flat_and_ordering(spark):
    rows = [
        ("flat", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 12.5, 1)
        for h in range(25)
    ]
    out = ts.rolling_median_channel(ts.hourly_close(_tick_df(spark, rows)), periods=20).collect()
    assert out
    for r in out:
        assert r.med == pytest.approx(12.5)
        assert float(r.don_hi) == float(r.don_lo) == 12.5
        assert r.don_mid == pytest.approx(12.5)


def test_rolling_median_bounds_on_real_data(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_market import q_rolling_median

    for r in q_rolling_median(spark, sf_dir).collect():
        assert float(r.don_lo) <= r.med <= float(r.don_hi)
        assert float(r.don_lo) <= r.don_mid <= float(r.don_hi)


def test_obv_rising_series_accumulates_all_volume(spark):
    rows = [
        ("up", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 10.0 + h, 1)
        for h in range(10)
    ]
    candles = ts.ohlc(_tick_df(spark, rows)).select("symbol", "bucket", "close", "volume")
    out = sorted(ts.obv(candles).collect(), key=lambda r: r.bucket)
    # first bar contributes 0 (no prev); every later bar adds its volume
    vols = [r.volume for r in out]
    expect = [0]
    for v in vols[1:]:
        expect.append(expect[-1] + v)
    assert [r.obv for r in out] == expect


def test_stochastic_bounds_and_extremes(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_market import q_stochastic

    rows = q_stochastic(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.k is not None:
            assert -1e-9 <= r.k <= 100.0 + 1e-9
    # strictly rising series: close is always the frame max → %K = 100
    up = [
        ("up", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 10.0 + h, 1)
        for h in range(20)
    ]
    for r in ts.stochastic(ts.hourly_close(_tick_df(spark, up)), periods=14).collect():
        assert r.k == pytest.approx(100.0)
        assert r.d == pytest.approx(100.0)


def test_atr_flat_and_range_series(spark):
    # constant price → TR 0 → ATR 0; alternating range shows TR >= high-low
    flat = [
        ("f", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 50.0, 1)
        for h in range(20)
    ]
    candles = ts.ohlc(_tick_df(spark, flat)).select("symbol", "bucket", "high", "low", "close")
    out = ts.atr(candles, periods=14).collect()
    assert out
    for r in out:
        assert float(r.tr) == 0.0 and r.atr == pytest.approx(0.0)


def test_macd_flat_series_is_zero(spark):
    rows = [
        ("f", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 75.0, 1)
        for h in range(50)
    ]
    out = ts.macd(ts.hourly_close(_tick_df(spark, rows))).collect()
    assert out
    for r in out:
        assert r.macd == pytest.approx(0.0)
        assert r.signal == pytest.approx(0.0)
        assert r.histogram == pytest.approx(0.0)


def test_realized_vol_and_seasonality(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_market import q_realized_vol, q_seasonality

    vol = q_realized_vol(spark, sf_dir).collect()
    assert vol
    for r in vol:
        assert r.rvol is not None and r.rvol >= 0.0
    seas = q_seasonality(spark, sf_dir).collect()
    assert seas
    for r in seas:
        assert 0 <= r.hod <= 23
        assert r.n_ticks >= 1


def test_holt_flat_series_equals_price(spark):
    rows = [
        ("eth", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, 40.0, 1)
        for h in range(35)
    ]
    out = ts.holt_fir(ts.hourly_close(_tick_df(spark, rows))).collect()
    assert len(out) == 35 - 29
    # normalization pins the constant-series fixed point exactly
    assert all(r.holt == pytest.approx(40.0, abs=1e-6) for r in out)


def test_holt_fir_matches_sequential_recursion(spark):
    """The truncated matrix-geometric kernel vs the textbook
    sequential Holt recursion (seeded s=x0, b=x1-x0): after the seed
    influence decays (|eig|^t = (1-alpha)^(t/2)), the two must agree
    to the truncation error (~1e-6 of the kernel at alpha=0.6)."""
    import math

    a, b_ = 0.6, 0.4
    prices = [100.0 + 10.0 * math.sin(h / 5.0) + 0.5 * h for h in range(80)]
    rows = [
        ("btc", f"2024-01-{1 + h // 24:02d}T{h % 24:02d}:00:00", h, p, 1)
        for h, p in enumerate(prices)
    ]
    out = {
        r.bucket.hour + 24 * (r.bucket.day - 1): r.holt
        for r in ts.holt_fir(
            ts.hourly_close(_tick_df(spark, rows)), alpha=a, beta=b_, taps=30
        ).collect()
    }
    s, tr = prices[0], prices[1] - prices[0]
    seq = {}
    for t, x in enumerate(prices):
        if t == 0:
            seq[t] = s + tr
            continue
        s_prev = s
        s = a * x + (1 - a) * (s + tr)
        tr = b_ * (s - s_prev) + (1 - b_) * tr
        seq[t] = s + tr
    for t in range(60, 80):  # seed influence < (0.632)^60 ~ 1e-12
        assert out[t] == pytest.approx(seq[t], rel=1e-4), t


def test_holt_weights_sum_and_decay(spark):
    ws, den = ts.holt_fir_weights(0.6, 0.4, 30)
    assert len(ws) == 30
    assert den == pytest.approx(1.0, abs=1e-4)  # near-complete kernel
    assert abs(ws[-1]) < 1e-5  # tail truncated well below the head
    assert ws[0] == pytest.approx(0.6 + 0.6 * 0.4)


def test_twap_durations_cover_first_tick_to_midnight(spark):
    """Per (symbol, day): the duration weights partition the interval
    [first tick, next midnight) exactly — no gap, no overlap — and a
    constant-price day TWAPs to that price."""
    import datetime as dt

    from airflow_crypto_etl_spark.queries_market import q_twap

    rows = [
        ("btc", "2024-01-01T01:00:00", 1, 50.0, 1),
        ("btc", "2024-01-01T07:30:00", 2, 50.0, 1),
        ("btc", "2024-01-01T23:59:00", 3, 50.0, 1),
        ("eth", "2024-01-01T06:00:00", 4, 10.0, 1),
        ("eth", "2024-01-01T18:00:00", 5, 30.0, 1),
    ]
    import os, tempfile

    import pyspark.sql.functions as F

    df = _tick_df(spark, rows)
    # route through a parquet dir so q_twap's load_table path applies
    tmp = tempfile.mkdtemp()
    ev = df.select(
        F.col("tick_id").alias("event_id"),
        F.col("tick_ts").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.col("symbol").alias("event_type"),
        F.col("price").cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    out = {r.symbol: r for r in q_twap(spark, tmp).collect()}
    assert out["btc"].twap == 50.0  # constant price -> exact fixed point
    # eth: 10.0 for 12h, 30.0 for 6h -> (10*12 + 30*6) / 18 = 16.666667
    assert abs(out["eth"].twap - (10.0 * 12 + 30.0 * 6) / 18.0) < 1e-6
    assert out["btc"].n_ticks == 3 and out["eth"].n_ticks == 2
