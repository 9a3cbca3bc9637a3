"""Market time-series query registry: OHLC candles + VWAP, SMA
crossover, Cutler RSI, Bollinger bands, linear-interpolation gap-fill,
and rolling z-score anomaly detection over the `events` tick table.

These are the downstream analytics a user of the reference crypto ETL
(`/root/reference/dags/coin_data_pipeline_optimized.py` — hourly coin
prices into a warehouse) computes from the Silver price table; here
they are first-class distributed operators (operators/timeseries.py).

Portability: every multi-row accumulation is an exact DECIMAL (or
integer) sum — order-insensitive, so Spark's partial aggregation and
DuckDB's sequential scan agree bit-for-bit — and each published metric
is ONE fixed-order IEEE-double epilogue (a division, a sqrt, an
interpolation), rounded at 6dp. 6dp half-boundaries (odd multiples of
5e-7) are never dyadic, so no double sits exactly on one and Spark
HALF_UP vs DuckDB rounding cannot disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import timeseries as ts
from .queries import _t

# ---------------------------------------------------------------------------
# Shared oracle fragments (mirror operators/timeseries.with_market_cols
# and hourly_close)
# ---------------------------------------------------------------------------

def _ticks_sql(granularity: str) -> str:
    """Oracle twin of with_market_cols at the given bucket granularity
    (parameterized — a string replace on the hourly SQL would silently
    no-op if the text ever changed shape)."""
    return f"""
SELECT event_type AS symbol,
       date_trunc('{granularity}', ts) AS bucket,
       ts AS tick_ts,
       event_id AS tick_id,
       CAST(value AS DECIMAL(18,4)) AS price,
       CAST(event_id % 7 + 1 AS BIGINT) AS volume
FROM events
"""


_TICKS_SQL = _ticks_sql("hour")

_CLOSES_SQL = f"""
SELECT symbol, bucket,
       (max(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS close
FROM ({_TICKS_SQL}) t
GROUP BY symbol, bucket
"""


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ts.with_market_cols(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# OHLC candles + VWAP
# ---------------------------------------------------------------------------


def q_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles with volume and VWAP per symbol — one
    partial-aggregatable groupBy over the ticks (argmin/argmax via
    lexicographic struct min/max), no window sort."""
    return ts.ohlc(_ticks(spark, sf_dir))


ORACLE_OHLC_CANDLES = f"""
WITH t AS ({_TICKS_SQL}),
agg AS (
  SELECT symbol, bucket,
         (min(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS open_d,
         max(price) AS high_d,
         min(price) AS low_d,
         (max(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS close_d,
         CAST(sum(volume) AS BIGINT) AS volume,
         CAST(count(*) AS BIGINT) AS n_trades,
         sum(price * CAST(volume AS DECIMAL(18,0))) AS pv
  FROM t GROUP BY symbol, bucket)
SELECT symbol, bucket,
       CAST(open_d AS DOUBLE)  AS open,
       CAST(high_d AS DOUBLE)  AS high,
       CAST(low_d AS DOUBLE)   AS low,
       CAST(close_d AS DOUBLE) AS close,
       volume, n_trades,
       CASE WHEN volume = 0 THEN NULL
            ELSE round(CAST(pv AS DOUBLE) / CAST(volume AS DOUBLE), 6) END AS vwap
FROM agg
"""


# ---------------------------------------------------------------------------
# SMA crossover
# ---------------------------------------------------------------------------

_SMA_FAST, _SMA_SLOW = 5, 20


def q_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow simple moving averages over the hourly close series
    with the golden-cross signal; full frames only."""
    return ts.sma_crossover(
        ts.hourly_close(_ticks(spark, sf_dir)), fast=_SMA_FAST, slow=_SMA_SLOW
    )


ORACLE_SMA_CROSSOVER = f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         round(CAST(sum(close) OVER wf AS DOUBLE) / CAST({_SMA_FAST} AS DOUBLE), 6) AS sma_fast,
         round(CAST(sum(close) OVER ws AS DOUBLE) / CAST({_SMA_SLOW} AS DOUBLE), 6) AS sma_slow
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_SMA_FAST - 1} PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_SMA_SLOW - 1} PRECEDING AND CURRENT ROW))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close, sma_fast, sma_slow,
       CAST(sma_fast > sma_slow AS INT) AS golden
FROM x WHERE rn >= {_SMA_SLOW}
"""


# ---------------------------------------------------------------------------
# Cutler RSI
# ---------------------------------------------------------------------------

_RSI_N = 14


def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI (SMA of gains/losses — exact under decimal sums,
    unlike the recursive Wilder EMA) over the hourly close series."""
    return ts.rsi_cutler(ts.hourly_close(_ticks(spark, sf_dir)), periods=_RSI_N)


ORACLE_RSI = f"""
WITH closes AS ({_CLOSES_SQL}),
d AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         close - lag(close, 1) OVER wo AS delta
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket)),
g AS (
  SELECT symbol, bucket, close, rn,
         sum(CASE WHEN delta > 0 THEN delta ELSE CAST('0' AS DECIMAL(18,4)) END) OVER wf AS sum_gain_d,
         sum(CASE WHEN delta < 0 THEN -delta ELSE CAST('0' AS DECIMAL(18,4)) END) OVER wf AS sum_loss_d
  FROM d
  WINDOW wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_RSI_N - 1} PRECEDING AND CURRENT ROW))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close,
       CAST(sum_gain_d AS DOUBLE) AS sum_gain,
       CAST(sum_loss_d AS DOUBLE) AS sum_loss,
       CASE WHEN CAST(sum_gain_d AS DOUBLE) + CAST(sum_loss_d AS DOUBLE) = 0.0 THEN NULL
            ELSE round(100.0 * CAST(sum_gain_d AS DOUBLE)
                       / (CAST(sum_gain_d AS DOUBLE) + CAST(sum_loss_d AS DOUBLE)), 6)
       END AS rsi
FROM g WHERE rn >= {_RSI_N + 1}
"""


# ---------------------------------------------------------------------------
# Bollinger bands
# ---------------------------------------------------------------------------

_BB_N = 20
_BB_W = 2.0


def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20-period, 2σ) over the hourly close series —
    decimal sum / sum-of-squares, double epilogue."""
    return ts.bollinger(ts.hourly_close(_ticks(spark, sf_dir)), periods=_BB_N, width=_BB_W)


ORACLE_BOLLINGER = f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         CAST(sum(close) OVER wf AS DOUBLE) AS s1,
         CAST(sum(close * close) OVER wf AS DOUBLE) AS s2
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_BB_N - 1} PRECEDING AND CURRENT ROW))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close,
       round(s1 / {float(_BB_N)}, 6) AS mid,
       round(s1 / {float(_BB_N)} + {_BB_W} * sqrt(greatest((s2 - s1 * s1 / {float(_BB_N)}) / {float(_BB_N - 1)}, 0.0)), 6) AS upper,
       round(s1 / {float(_BB_N)} - {_BB_W} * sqrt(greatest((s2 - s1 * s1 / {float(_BB_N)}) / {float(_BB_N - 1)}, 0.0)), 6) AS lower
FROM x WHERE rn >= {_BB_N}
"""


# ---------------------------------------------------------------------------
# Gap-fill with linear interpolation
# ---------------------------------------------------------------------------


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each symbol's hourly close series onto a complete bucket
    spine; interior gaps are linearly interpolated between the nearest
    real closes, edges forward/backward-fill."""
    return ts.gapfill_linear(ts.hourly_close(_ticks(spark, sf_dir)))


ORACLE_GAPFILL_INTERP = f"""
WITH closes AS ({_CLOSES_SQL}),
bounds AS (SELECT symbol, min(bucket) AS mn, max(bucket) AS mx FROM closes GROUP BY symbol),
spine AS (
  SELECT symbol, unnest(generate_series(mn, mx, INTERVAL 3600 SECOND)) AS bucket
  FROM bounds),
j AS (
  SELECT s.symbol, s.bucket, c.close,
         CAST(floor(epoch(s.bucket) / 3600) AS BIGINT) AS hseq
  FROM spine s LEFT JOIN closes c ON s.symbol = c.symbol AND s.bucket = c.bucket),
n AS (
  SELECT symbol, bucket, close, hseq,
         last_value(close IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN close IS NOT NULL THEN hseq END IGNORE NULLS) OVER wp AS prev_t,
         first_value(close IGNORE NULLS) OVER wn AS next_v,
         first_value(CASE WHEN close IS NOT NULL THEN hseq END IGNORE NULLS) OVER wn AS next_t
  FROM j
  WINDOW wp AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT symbol, bucket,
       CAST(close IS NULL AS INT) AS is_gap,
       CASE WHEN close IS NOT NULL THEN CAST(close AS DOUBLE)
            WHEN prev_v IS NULL THEN CAST(next_v AS DOUBLE)
            WHEN next_v IS NULL THEN CAST(prev_v AS DOUBLE)
            ELSE round(CAST(prev_v AS DOUBLE)
                       + (CAST(next_v AS DOUBLE) - CAST(prev_v AS DOUBLE))
                         * (CAST(hseq - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)), 6)
       END AS px
FROM n
"""


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection
# ---------------------------------------------------------------------------

_Z_TRAIL = 24


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score of hourly tick counts per symbol against the
    trailing 24 hours (current hour excluded from its own baseline)."""
    ticks = _ticks(spark, sf_dir)
    counts = ticks.groupBy("symbol", "bucket").count().withColumnRenamed("count", "n_ticks")
    return ts.rolling_zscore(counts, "n_ticks", trailing=_Z_TRAIL)


ORACLE_ANOMALY_ZSCORE = f"""
WITH t AS ({_TICKS_SQL}),
counts AS (SELECT symbol, bucket, CAST(count(*) AS BIGINT) AS n_ticks FROM t GROUP BY symbol, bucket),
x AS (
  SELECT symbol, bucket, n_ticks,
         row_number() OVER wo AS rn,
         CAST(sum(n_ticks) OVER wf AS DOUBLE) AS s1,
         CAST(sum(n_ticks * n_ticks) OVER wf AS DOUBLE) AS s2
  FROM counts
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_Z_TRAIL} PRECEDING AND 1 PRECEDING))
SELECT symbol, bucket, n_ticks AS obs,
       round(s1 / {float(_Z_TRAIL)}, 6) AS mu,
       CASE WHEN sqrt(greatest((s2 - s1 * s1 / {float(_Z_TRAIL)}) / {float(_Z_TRAIL - 1)}, 0.0)) = 0.0 THEN NULL
            ELSE round((CAST(n_ticks AS DOUBLE) - s1 / {float(_Z_TRAIL)})
                       / sqrt(greatest((s2 - s1 * s1 / {float(_Z_TRAIL)}) / {float(_Z_TRAIL - 1)}, 0.0)), 6)
       END AS z
FROM x WHERE rn >= {_Z_TRAIL + 1}
"""


QUERIES_MARKET = {
    "q_ohlc_candles": q_ohlc_candles,
    "q_sma_crossover": q_sma_crossover,
    "q_rsi": q_rsi,
    "q_bollinger": q_bollinger,
    "q_gapfill_interp": q_gapfill_interp,
    "q_anomaly_zscore": q_anomaly_zscore,
}

ORACLE_MARKET = {
    "q_ohlc_candles": ORACLE_OHLC_CANDLES,
    "q_sma_crossover": ORACLE_SMA_CROSSOVER,
    "q_rsi": ORACLE_RSI,
    "q_bollinger": ORACLE_BOLLINGER,
    "q_gapfill_interp": ORACLE_GAPFILL_INTERP,
    "q_anomaly_zscore": ORACLE_ANOMALY_ZSCORE,
}


# ---------------------------------------------------------------------------
# Streaming candles: the same OHLC aggregation executed by the
# streaming engine (bounded availableNow replay in complete mode emits
# exactly the batch result, so the batch oracle applies verbatim).
# ---------------------------------------------------------------------------


def q_stream_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.windows import streaming_candles

    return streaming_candles(spark, sf_dir)


QUERIES_MARKET["q_stream_candles"] = q_stream_candles
ORACLE_MARKET["q_stream_candles"] = ORACLE_OHLC_CANDLES


# ---------------------------------------------------------------------------
# Running-peak drawdown
# ---------------------------------------------------------------------------


def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and drawdown-from-peak per symbol (window max over
    the unbounded frame — exact decimal; one double division)."""
    return ts.drawdown(ts.hourly_close(_ticks(spark, sf_dir)))


ORACLE_DRAWDOWN = f"""
WITH closes AS ({_CLOSES_SQL})
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close,
       CAST(max(close) OVER wp AS DOUBLE) AS peak,
       CASE WHEN max(close) OVER wp = 0 THEN NULL
            ELSE round((CAST(max(close) OVER wp AS DOUBLE) - CAST(close AS DOUBLE))
                       / CAST(max(close) OVER wp AS DOUBLE), 6) END AS dd
FROM closes
WINDOW wp AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# FIR-truncated EMA
# ---------------------------------------------------------------------------

_EMA_P, _EMA_TAPS = 10, 30


def q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA as an explicit 30-tap FIR kernel over the hourly closes —
    the shuffle-free, partition-independent form of the recursive EMA
    (tail below float precision truncated). Tap weights are inlined as
    identical double literals into both engines; the fold order is
    pinned (Spark aggregate ↔ DuckDB list_reduce)."""
    return ts.ema_fir(ts.hourly_close(_ticks(spark, sf_dir)), periods=_EMA_P, taps=_EMA_TAPS)


def _ema_oracle() -> str:
    ws, den = ts.ema_fir_weights(_EMA_P, _EMA_TAPS)
    wlist = "[" + ", ".join(repr(w) for w in ws) + "]"
    return f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         list_reverse(list(CAST(close AS DOUBLE)) OVER wf) AS lags
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_EMA_TAPS - 1} PRECEDING AND CURRENT ROW))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close,
       round(list_reduce(
               list_transform(range(1, {_EMA_TAPS + 1}),
                              i -> lags[i] * (CAST({wlist} AS DOUBLE[]))[i]),
               (acc, v) -> acc + v) / {den!r}, 6) AS ema
FROM x WHERE rn >= {_EMA_TAPS}
"""


ORACLE_EMA = _ema_oracle()


# ---------------------------------------------------------------------------
# Daily top movers
# ---------------------------------------------------------------------------

_MOVERS_K = 3


def q_daily_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k daily movers: per-day ranking of symbols by close-over-
    close percent change (daily candles via the same struct-argmax
    close; deterministic (pct DESC, symbol) tie-break)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    daily = ts.hourly_close(
        ts.with_market_cols(_t(spark, sf_dir, "events"), bucket="day")
    )
    w = Window.partitionBy("symbol").orderBy("bucket")
    prev = F.lag("close", 1).over(w)
    pct = F.round(
        (F.col("close").cast("double") - F.col("prev").cast("double"))
        / F.col("prev").cast("double"),
        ts.ROUND_DP,
    )
    ranked = (
        daily.withColumn("prev", prev)
        # prev = 0 excluded: pct is undefined and the division would
        # raise under ANSI
        .filter(F.col("prev").isNotNull() & (F.col("prev") != 0))
        .withColumn("pct", pct)
        .withColumn(
            "mrank",
            F.row_number()
            .over(Window.partitionBy("bucket").orderBy(F.col("pct").desc(), F.col("symbol")))
            .cast("int"),
        )
        .filter(F.col("mrank") <= _MOVERS_K)
    )
    # day-granularity bucket publishes as DATE (DuckDB's
    # date_trunc('day', ts) is a DATE; Spark's is a timestamp)
    return ranked.select(
        F.to_date("bucket").alias("bucket"), "symbol", "close", "prev", "pct", "mrank"
    )


_DAILY_TICKS_SQL = _ticks_sql("day")

_DAILY_CLOSES_SQL = f"""
SELECT symbol, bucket,
       (max(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS close
FROM ({_DAILY_TICKS_SQL}) t
GROUP BY symbol, bucket
"""

ORACLE_DAILY_MOVERS = f"""
WITH closes AS ({_DAILY_CLOSES_SQL}),
d AS (
  SELECT symbol, bucket, close,
         lag(close, 1) OVER (PARTITION BY symbol ORDER BY bucket) AS prev
  FROM closes),
p AS (
  SELECT CAST(bucket AS DATE) AS bucket, symbol,
         CAST(close AS DOUBLE) AS close, CAST(prev AS DOUBLE) AS prev,
         round((CAST(close AS DOUBLE) - CAST(prev AS DOUBLE)) / CAST(prev AS DOUBLE), 6) AS pct
  FROM d WHERE prev IS NOT NULL AND prev <> 0)
SELECT bucket, symbol, close, prev, pct, mrank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY bucket ORDER BY pct DESC, symbol) AS INT) AS mrank
  FROM p)
WHERE mrank <= {_MOVERS_K}
"""


QUERIES_MARKET["q_drawdown"] = q_drawdown
ORACLE_MARKET["q_drawdown"] = ORACLE_DRAWDOWN
QUERIES_MARKET["q_ema"] = q_ema
ORACLE_MARKET["q_ema"] = ORACLE_EMA
QUERIES_MARKET["q_daily_movers"] = q_daily_movers
ORACLE_MARKET["q_daily_movers"] = ORACLE_DAILY_MOVERS


# ---------------------------------------------------------------------------
# Cross-series correlation matrix
# ---------------------------------------------------------------------------


def q_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise symbol correlation + OLS beta from exact decimal power
    sums over co-traded hours (bucket self-join, one pair groupBy)."""
    return ts.pairwise_corr(ts.hourly_close(_ticks(spark, sf_dir)))


ORACLE_CORR_PAIRS = f"""
WITH closes AS ({_CLOSES_SQL}),
pairs AS (
  SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.close AS xa, b.close AS xb
  FROM closes a JOIN closes b ON a.bucket = b.bucket
  WHERE a.symbol < b.symbol),
g AS (
  SELECT sym_a, sym_b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xa) AS DOUBLE) AS sx,
         CAST(sum(xb) AS DOUBLE) AS sy,
         CAST(sum(xa * xa) AS DOUBLE) AS sxx,
         CAST(sum(xb * xb) AS DOUBLE) AS syy,
         CAST(sum(xa * xb) AS DOUBLE) AS sxy
  FROM pairs GROUP BY sym_a, sym_b)
SELECT sym_a, sym_b, n,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) <= 0.0
              OR (CAST(n AS DOUBLE) * syy - sy * sy) <= 0.0 THEN NULL
            ELSE round((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
       END AS corr,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) <= 0.0 THEN NULL
            ELSE round((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx), 6)
       END AS beta
FROM g
"""

QUERIES_MARKET["q_corr_pairs"] = q_corr_pairs
ORACLE_MARKET["q_corr_pairs"] = ORACLE_CORR_PAIRS


# ---------------------------------------------------------------------------
# SMA-crossover backtest
# ---------------------------------------------------------------------------


def q_backtest_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long/flat SMA-crossover backtest: lagged signal (no lookahead),
    decimal-exact per-bar PnL and running total."""
    return ts.backtest_crossover(
        ts.hourly_close(_ticks(spark, sf_dir)), fast=_SMA_FAST, slow=_SMA_SLOW
    )


ORACLE_BACKTEST_SMA = f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         round(CAST(sum(close) OVER wf AS DOUBLE) / CAST({_SMA_FAST} AS DOUBLE), 6) AS sma_fast,
         round(CAST(sum(close) OVER ws AS DOUBLE) / CAST({_SMA_SLOW} AS DOUBLE), 6) AS sma_slow
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_SMA_FAST - 1} PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_SMA_SLOW - 1} PRECEDING AND CURRENT ROW)),
sig AS (
  SELECT symbol, bucket, close,
         CAST(sma_fast > sma_slow AS INT) AS golden
  FROM x WHERE rn >= {_SMA_SLOW}),
p AS (
  SELECT symbol, bucket, close,
         lag(golden, 1) OVER wo AS pos,
         close - lag(close, 1) OVER wo AS ret
  FROM sig
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket)),
q AS (
  SELECT symbol, bucket, close, pos,
         CASE WHEN pos = 1 THEN ret ELSE CAST('0' AS DECIMAL(19,4)) END AS pnl
  FROM p WHERE pos IS NOT NULL)
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close, pos,
       CAST(pnl AS DOUBLE) AS pnl,
       CAST(sum(pnl) OVER (PARTITION BY symbol ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_pnl
FROM q
"""

QUERIES_MARKET["q_backtest_sma"] = q_backtest_sma
ORACLE_MARKET["q_backtest_sma"] = ORACLE_BACKTEST_SMA


def q_stream_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive per-symbol EMA with cross-batch streaming state,
    reduced to the LATEST state per symbol (update-mode memory sinks
    hold one row per update; max_by(n_ticks) is the serving view and
    makes the result batching-invariant). Oracle-checked (r4 verdict
    item 2): the recursion ema_t = α·x_t + (1−α)·ema_{t−1} seeded with
    x_0 — exactly pandas ewm(adjust=False) — is a left fold, which
    DuckDB expresses directly as list_reduce over the ts-ordered price
    list. α is written as the same 2.0/(N+1) float expression on both
    sides."""
    from pyspark.sql import functions as F

    from .streaming.windows import streaming_ema_per_symbol

    upd = streaming_ema_per_symbol(spark, sf_dir)
    return upd.groupBy("symbol").agg(
        F.max("n_ticks").alias("n_ticks"),
        F.max_by("ema", "n_ticks").alias("ema"),
    )


# mirror streaming.stateful: EMA_PERIODS=10, alpha = 2/(10+1) as float
ORACLE_STREAM_EMA = f"""
WITH t AS ({_TICKS_SQL})
SELECT symbol, CAST(count(*) AS BIGINT) AS n_ticks,
       list_reduce(list(CAST(price AS DOUBLE) ORDER BY tick_ts, tick_id),
                   (acc, x) -> (2.0/11.0) * x + (1.0 - 2.0/11.0) * acc) AS ema
FROM t GROUP BY symbol
"""

QUERIES_MARKET["q_stream_ema"] = q_stream_ema
ORACLE_MARKET["q_stream_ema"] = ORACLE_STREAM_EMA


# ---------------------------------------------------------------------------
# Candle rollup (hourly partials → 4-hour candles)
# ---------------------------------------------------------------------------

_ROLLUP_STEP = 14400


def q_candle_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-hour candles merged from hourly candle partials (pv carried
    exactly, so rollup VWAP is lossless) — the continuous-aggregate
    maintenance shape: no tick rescan."""
    hourly = ts.ohlc(_ticks(spark, sf_dir), keep_pv=True)
    return ts.ohlc_rollup(hourly, step_seconds=_ROLLUP_STEP)


ORACLE_CANDLE_ROLLUP = f"""
WITH t AS ({_TICKS_SQL}),
h AS (
  SELECT symbol, bucket,
         (min(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS open_d,
         max(price) AS high_d,
         min(price) AS low_d,
         (max(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS close_d,
         CAST(sum(volume) AS BIGINT) AS volume,
         CAST(count(*) AS BIGINT) AS n_trades,
         sum(price * CAST(volume AS DECIMAL(18,0))) AS pv
  FROM t GROUP BY symbol, bucket),
r AS (
  SELECT symbol,
         CAST(to_timestamp(CAST(floor(epoch(bucket) / {_ROLLUP_STEP}) AS BIGINT) * {_ROLLUP_STEP}) AS TIMESTAMP) AS bucket4,
         (min(struct_pack(b := bucket, o := open_d))).o AS open_d,
         max(high_d) AS high_d,
         min(low_d) AS low_d,
         (max(struct_pack(b := bucket, c := close_d))).c AS close_d,
         CAST(sum(volume) AS BIGINT) AS volume,
         CAST(sum(n_trades) AS BIGINT) AS n_trades,
         sum(pv) AS pv
  FROM h GROUP BY symbol, bucket4)
SELECT symbol, bucket4 AS bucket,
       CAST(open_d AS DOUBLE)  AS open,
       CAST(high_d AS DOUBLE)  AS high,
       CAST(low_d AS DOUBLE)   AS low,
       CAST(close_d AS DOUBLE) AS close,
       volume, n_trades,
       CASE WHEN volume = 0 THEN NULL
            ELSE round(CAST(pv AS DOUBLE) / CAST(volume AS DOUBLE), 6) END AS vwap
FROM r
"""

QUERIES_MARKET["q_candle_rollup"] = q_candle_rollup
ORACLE_MARKET["q_candle_rollup"] = ORACLE_CANDLE_ROLLUP


# ---------------------------------------------------------------------------
# Autocorrelation (ACF at lags 1-3)
# ---------------------------------------------------------------------------


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol close-series autocorrelation at lags 1-3 — window-lag
    pairs through the exact power-sum Pearson epilogue."""
    return ts.autocorr(ts.hourly_close(_ticks(spark, sf_dir)))


ORACLE_AUTOCORR = f"""
WITH closes AS ({_CLOSES_SQL}),
pairs AS (
  SELECT symbol, lag, close AS x, y FROM (
    SELECT symbol, close,
           unnest([1, 2, 3]) AS lag,
           unnest([lag(close, 1) OVER wo, lag(close, 2) OVER wo, lag(close, 3) OVER wo]) AS y
    FROM closes
    WINDOW wo AS (PARTITION BY symbol ORDER BY bucket))
  WHERE y IS NOT NULL),
g AS (
  SELECT symbol, lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(y * y) AS DOUBLE) AS syy,
         CAST(sum(x * y) AS DOUBLE) AS sxy
  FROM pairs GROUP BY symbol, lag)
SELECT symbol, CAST(lag AS INT) AS lag, n,
       CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) <= 0.0
              OR (CAST(n AS DOUBLE) * syy - sy * sy) <= 0.0 THEN NULL
            ELSE round((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                              * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
       END AS acf
FROM g
"""

QUERIES_MARKET["q_autocorr"] = q_autocorr
ORACLE_MARKET["q_autocorr"] = ORACLE_AUTOCORR


# ---------------------------------------------------------------------------
# Rolling median + Donchian channel
# ---------------------------------------------------------------------------

_MED_N = 20


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median and Donchian channel over 20 hourly closes
    per symbol — sort-based window percentile, decimal channel bounds."""
    return ts.rolling_median_channel(ts.hourly_close(_ticks(spark, sf_dir)), periods=_MED_N)


ORACLE_ROLLING_MEDIAN = f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         round(CAST(quantile_cont(CAST(close AS DOUBLE), 0.5) OVER wf AS DOUBLE), 6) AS med,
         max(close) OVER wf AS don_hi_d,
         min(close) OVER wf AS don_lo_d
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_MED_N - 1} PRECEDING AND CURRENT ROW))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close, med,
       CAST(don_hi_d AS DOUBLE) AS don_hi,
       CAST(don_lo_d AS DOUBLE) AS don_lo,
       round((CAST(don_hi_d AS DOUBLE) + CAST(don_lo_d AS DOUBLE)) / 2.0, 6) AS don_mid
FROM x WHERE rn >= {_MED_N}
"""

QUERIES_MARKET["q_rolling_median"] = q_rolling_median
ORACLE_MARKET["q_rolling_median"] = ORACLE_ROLLING_MEDIAN


# ---------------------------------------------------------------------------
# Momentum: OBV and stochastic oscillator
# ---------------------------------------------------------------------------


def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume — all-integer signed cumulative volume."""
    candles = ts.ohlc(_ticks(spark, sf_dir)).select("symbol", "bucket", "close", "volume")
    # close here is decimal (pre-finalize) — obv only compares it
    return ts.obv(candles)


ORACLE_OBV = f"""
WITH t AS ({_TICKS_SQL}),
c AS (
  SELECT symbol, bucket,
         (max(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS close,
         CAST(sum(volume) AS BIGINT) AS volume
  FROM t GROUP BY symbol, bucket),
d AS (
  SELECT symbol, bucket, close, volume,
         CASE WHEN lag(close, 1) OVER wo IS NULL THEN 0
              WHEN close > lag(close, 1) OVER wo THEN 1
              WHEN close < lag(close, 1) OVER wo THEN -1
              ELSE 0 END * volume AS dirvol
  FROM c
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close, volume,
       CAST(sum(dirvol) OVER (PARTITION BY symbol ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
FROM d
"""

_STOCH_N = 14


def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K/%D over the hourly close series."""
    return ts.stochastic(ts.hourly_close(_ticks(spark, sf_dir)), periods=_STOCH_N)


ORACLE_STOCHASTIC = f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         max(close) OVER wf AS hi,
         min(close) OVER wf AS lo
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_STOCH_N - 1} PRECEDING AND CURRENT ROW)),
kk AS (
  SELECT symbol, bucket, close, rn,
         CASE WHEN hi = lo THEN NULL
              ELSE round(100.0 * (CAST(close AS DOUBLE) - CAST(lo AS DOUBLE))
                         / (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)), 6) END AS k
  FROM x)
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close, k,
       round((k + lag(k, 1) OVER wo + lag(k, 2) OVER wo) / 3.0, 6) AS d
FROM kk
WINDOW wo AS (PARTITION BY symbol ORDER BY bucket)
QUALIFY rn >= {_STOCH_N + 2}
"""

QUERIES_MARKET["q_obv"] = q_obv
ORACLE_MARKET["q_obv"] = ORACLE_OBV
QUERIES_MARKET["q_stochastic"] = q_stochastic
ORACLE_MARKET["q_stochastic"] = ORACLE_STOCHASTIC


# ---------------------------------------------------------------------------
# Average True Range
# ---------------------------------------------------------------------------

_ATR_N = 14


def q_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATR over hourly candles — decimal-exact true ranges, SMA form."""
    candles = ts.ohlc(_ticks(spark, sf_dir)).select("symbol", "bucket", "high", "low", "close")
    return ts.atr(candles, periods=_ATR_N)


ORACLE_ATR = f"""
WITH t AS ({_TICKS_SQL}),
c AS (
  SELECT symbol, bucket,
         max(price) AS high,
         min(price) AS low,
         (max(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS close
  FROM t GROUP BY symbol, bucket),
d AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         greatest(high - low,
                  abs(high - lag(close, 1) OVER wo),
                  abs(low - lag(close, 1) OVER wo)) AS tr
  FROM c
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket)),
s AS (
  SELECT symbol, bucket, close, rn, tr,
         sum(tr) OVER (PARTITION BY symbol ORDER BY bucket
              ROWS BETWEEN {_ATR_N - 1} PRECEDING AND CURRENT ROW) AS trs
  FROM d WHERE tr IS NOT NULL)
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close,
       CAST(tr AS DOUBLE) AS tr,
       round(CAST(trs AS DOUBLE) / {float(_ATR_N)}, 6) AS atr
FROM s WHERE rn >= {_ATR_N + 1}
"""

QUERIES_MARKET["q_atr"] = q_atr
ORACLE_MARKET["q_atr"] = ORACLE_ATR


# ---------------------------------------------------------------------------
# MACD with signal line
# ---------------------------------------------------------------------------

_MACD_F, _MACD_S, _MACD_SIG = 12, 26, 9
_MACD_TAPS, _MACD_SIG_TAPS = 30, 15


def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD line, signal, and histogram in the FIR form — two pinned
    left-to-right folds with driver-inlined weight literals."""
    return ts.macd(
        ts.hourly_close(_ticks(spark, sf_dir)),
        fast=_MACD_F, slow=_MACD_S, signal=_MACD_SIG,
        taps=_MACD_TAPS, signal_taps=_MACD_SIG_TAPS,
    )


def _macd_oracle() -> str:
    wf, den_f = ts.ema_fir_weights(_MACD_F, _MACD_TAPS)
    ws, den_s = ts.ema_fir_weights(_MACD_S, _MACD_TAPS)
    wg, den_g = ts.ema_fir_weights(_MACD_SIG, _MACD_SIG_TAPS)

    def lst(ws_):
        return "CAST([" + ", ".join(repr(w) for w in ws_) + "] AS DOUBLE[])"

    def fir(wlist, den, lags="lags", n=_MACD_TAPS):
        return (
            f"list_reduce(list_transform(range(1, {n + 1}),"
            f" i -> {lags}[i] * ({wlist})[i]), (acc, v) -> acc + v) / {den!r}"
        )

    return f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         list_reverse(list(CAST(close AS DOUBLE)) OVER wf) AS lags
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_MACD_TAPS - 1} PRECEDING AND CURRENT ROW)),
m AS (
  SELECT symbol, bucket, close,
         round({fir(lst(wf), den_f)} - {fir(lst(ws), den_s)}, 6) AS macd
  FROM x WHERE rn >= {_MACD_TAPS}),
s AS (
  SELECT symbol, bucket, close, macd,
         row_number() OVER wo AS rn2,
         list_reverse(list(macd) OVER wg) AS mlags
  FROM m
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wg AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_MACD_SIG_TAPS - 1} PRECEDING AND CURRENT ROW))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close, macd,
       round({fir(lst(wg), den_g, "mlags", _MACD_SIG_TAPS)}, 6) AS signal,
       round(macd - round({fir(lst(wg), den_g, "mlags", _MACD_SIG_TAPS)}, 6), 6) AS histogram
FROM s WHERE rn2 >= {_MACD_SIG_TAPS}
"""


ORACLE_MACD = _macd_oracle()

QUERIES_MARKET["q_macd"] = q_macd
ORACLE_MARKET["q_macd"] = ORACLE_MACD


# ---------------------------------------------------------------------------
# Realized volatility and hour-of-day seasonality
# ---------------------------------------------------------------------------


def q_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily realized volatility per symbol: sqrt of the sum of squared
    hourly close-over-close returns. Each return is one double division
    rounded at 6dp, then QUANTIZED to decimal(18,6) — exact on both
    engines — so the squared terms and their per-day sum are
    order-insensitive decimals; only the final sqrt is a double op.
    (An unquantized double sum would depend on partial-agg merge
    order.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    closes = ts.hourly_close(_ticks(spark, sf_dir))
    w = Window.partitionBy("symbol").orderBy("bucket")
    prev = F.lag("close", 1).over(w)
    r = F.when(prev.isNull() | (prev == 0), None).otherwise(
        F.round(
            (F.col("close").cast("double") - prev.cast("double")) / prev.cast("double"),
            ts.ROUND_DP,
        )
    )
    rd = r.cast("decimal(12,6)")  # narrow: the square must fit int64-backed decimals in DuckDB
    day = F.to_date("bucket")
    g = (
        closes.withColumn("rd", rd)
        .filter(F.col("rd").isNotNull())
        .groupBy("symbol", day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rets"),
            F.sum(F.col("rd") * F.col("rd")).alias("_ss"),
        )
    )
    vol = F.round(F.sqrt(F.col("_ss").cast("double")), ts.ROUND_DP)
    return g.select("symbol", "day", "n_rets", vol.alias("rvol"))


ORACLE_REALIZED_VOL = f"""
WITH closes AS ({_CLOSES_SQL}),
r AS (
  SELECT symbol, bucket,
         CASE WHEN lag(close, 1) OVER wo IS NULL OR lag(close, 1) OVER wo = 0 THEN NULL
              ELSE CAST(round((CAST(close AS DOUBLE) - CAST(lag(close, 1) OVER wo AS DOUBLE))
                              / CAST(lag(close, 1) OVER wo AS DOUBLE), 6) AS DECIMAL(12,6))
         END AS rd
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket))
SELECT symbol, CAST(bucket AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_rets,
       round(sqrt(CAST(sum(CAST(rd AS DECIMAL(19,6)) * rd) AS DOUBLE)), 6) AS rvol
FROM r WHERE rd IS NOT NULL
GROUP BY symbol, CAST(bucket AS DATE)
"""


def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day trading profile per symbol: tick count, volume, and
    exact-decimal mean price for each of the 24 clock hours — the
    intraday seasonality table."""
    from pyspark.sql import functions as F

    t = _ticks(spark, sf_dir)
    g = t.groupBy("symbol", F.hour("tick_ts").cast("int").alias("hod")).agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("volume").alias("volume"),
        F.sum("price").alias("_sp"),
    )
    mean_px = F.round(F.col("_sp").cast("double") / F.col("n_ticks").cast("double"), ts.ROUND_DP)
    return g.select("symbol", "hod", "n_ticks", "volume", mean_px.alias("mean_px"))


ORACLE_SEASONALITY = f"""
WITH t AS ({_TICKS_SQL})
SELECT symbol, CAST(hour(tick_ts) AS INT) AS hod,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(sum(volume) AS BIGINT) AS volume,
       round(CAST(sum(price) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_px
FROM t GROUP BY symbol, CAST(hour(tick_ts) AS INT)
"""

QUERIES_MARKET["q_realized_vol"] = q_realized_vol
ORACLE_MARKET["q_realized_vol"] = ORACLE_REALIZED_VOL
QUERIES_MARKET["q_seasonality"] = q_seasonality
ORACLE_MARKET["q_seasonality"] = ORACLE_SEASONALITY


# ---------------------------------------------------------------------------
# Keltner channel (EMA midline ± ATR band)
# ---------------------------------------------------------------------------


def q_keltner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keltner channel over hourly candles — FIR-EMA midline joined
    with the ATR band on (symbol, bucket)."""
    candles = ts.ohlc(_ticks(spark, sf_dir)).select("symbol", "bucket", "high", "low", "close")
    return ts.keltner(candles, periods=_EMA_P, taps=_EMA_TAPS, atr_periods=_ATR_N, width=2.0)


def _keltner_oracle() -> str:
    ws, den = ts.ema_fir_weights(_EMA_P, _EMA_TAPS)
    wlist = "[" + ", ".join(repr(w) for w in ws) + "]"
    return f"""
WITH t AS ({_TICKS_SQL}),
c AS (
  SELECT symbol, bucket,
         max(price) AS high,
         min(price) AS low,
         (max(struct_pack(tick_ts := tick_ts, tick_id := tick_id, price := price))).price AS close
  FROM t GROUP BY symbol, bucket),
e AS (
  SELECT symbol, bucket,
         row_number() OVER wo AS rn,
         list_reverse(list(CAST(close AS DOUBLE)) OVER wf) AS lags
  FROM c
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_EMA_TAPS - 1} PRECEDING AND CURRENT ROW)),
mid AS (
  SELECT symbol, bucket,
         round(list_reduce(
                 list_transform(range(1, {_EMA_TAPS + 1}),
                                i -> lags[i] * (CAST({wlist} AS DOUBLE[]))[i]),
                 (acc, v) -> acc + v) / {den!r}, 6) AS mid
  FROM e WHERE rn >= {_EMA_TAPS}),
d AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         greatest(high - low,
                  abs(high - lag(close, 1) OVER wo),
                  abs(low - lag(close, 1) OVER wo)) AS tr
  FROM c
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket)),
a AS (
  SELECT symbol, bucket, close, rn,
         round(CAST(sum(tr) OVER (PARTITION BY symbol ORDER BY bucket
              ROWS BETWEEN {_ATR_N - 1} PRECEDING AND CURRENT ROW) AS DOUBLE) / {float(_ATR_N)}, 6) AS atr
  FROM d WHERE tr IS NOT NULL)
SELECT m.symbol, m.bucket, CAST(a.close AS DOUBLE) AS close, m.mid,
       round(m.mid + 2.0 * a.atr, 6) AS upper,
       round(m.mid - 2.0 * a.atr, 6) AS lower
FROM mid m JOIN a ON m.symbol = a.symbol AND m.bucket = a.bucket
WHERE a.rn >= {_ATR_N + 1}
"""


ORACLE_KELTNER = _keltner_oracle()

QUERIES_MARKET["q_keltner"] = q_keltner
ORACLE_MARKET["q_keltner"] = ORACLE_KELTNER


# ---------------------------------------------------------------------------
# Risk-adjusted performance: annualized Sharpe / Sortino / hit rate per
# symbol from the hourly close-over-close returns.
# ---------------------------------------------------------------------------


def q_sharpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per symbol over the whole tape: annualized Sharpe (mean/stdev of
    hourly returns x sqrt(8760)), Sortino (downside deviation in the
    denominator), and hit rate. Returns are quantized decimal(12,6)
    exactly as q_realized_vol, so the four sums (r, r^2, negative-r^2,
    positive count) are order-free decimals off ONE symbol-partitioned
    lag window + partial agg; each published stat is a pinned double
    epilogue guarded for degenerate groups (n<2, zero variance, no
    down hours) under ANSI."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    closes = ts.hourly_close(_ticks(spark, sf_dir))
    w = Window.partitionBy("symbol").orderBy("bucket")
    prev = F.lag("close", 1).over(w)
    r = F.when(prev.isNull() | (prev == 0), None).otherwise(
        F.round(
            (F.col("close").cast("double") - prev.cast("double")) / prev.cast("double"),
            ts.ROUND_DP,
        )
    )
    rd = r.cast("decimal(12,6)")
    g = (
        closes.withColumn("rd", rd)
        .filter(F.col("rd").isNotNull())
        .groupBy("symbol")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rd").alias("_sr"),
            F.sum(F.col("rd") * F.col("rd")).alias("_srr"),
            F.sum(F.when(F.col("rd") < 0, F.col("rd") * F.col("rd"))).alias("_sdown"),
            F.sum((F.col("rd") > 0).cast("bigint")).alias("_npos"),
        )
    )
    n_d = F.col("n").cast("double")
    sr = F.col("_sr").cast("double")
    srr = F.col("_srr").cast("double")
    sdown = F.col("_sdown").cast("double")
    mean = sr / n_d
    var = (srr - ((sr * sr) / n_d)) / (n_d - F.lit(1.0))
    ann = F.sqrt(F.lit(8760.0))
    sharpe = F.when(
        (F.col("n") > 1) & (var > 0), F.round((mean / F.sqrt(var)) * ann, 6)
    )
    sortino = F.when(
        F.col("_sdown").isNotNull() & (sdown > 0),
        F.round((mean / F.sqrt(sdown / n_d)) * ann, 6),
    )
    hit = F.round(F.col("_npos").cast("double") / n_d, 6)
    return g.select(
        "symbol",
        "n",
        sharpe.alias("sharpe"),
        sortino.alias("sortino"),
        hit.alias("hit_rate"),
    )


ORACLE_SHARPE = f"""
WITH closes AS ({_CLOSES_SQL}),
r AS (
  SELECT symbol,
         CASE WHEN lag(close, 1) OVER wo IS NULL OR lag(close, 1) OVER wo = 0 THEN NULL
              ELSE CAST(round((CAST(close AS DOUBLE) - CAST(lag(close, 1) OVER wo AS DOUBLE))
                              / CAST(lag(close, 1) OVER wo AS DOUBLE), 6) AS DECIMAL(12,6))
         END AS rd
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket)),
g AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(rd AS DECIMAL(19,6))) AS DOUBLE) AS sr,
         CAST(sum(CAST(rd AS DECIMAL(19,6)) * rd) AS DOUBLE) AS srr,
         CAST(sum(CASE WHEN rd < 0 THEN CAST(rd AS DECIMAL(19,6)) * rd END) AS DOUBLE) AS sdown,
         CAST(sum(CASE WHEN rd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS npos
  FROM r WHERE rd IS NOT NULL
  GROUP BY symbol)
SELECT symbol, n,
       CASE WHEN n > 1 AND ((srr - ((sr * sr) / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)) > 0
            THEN round(((sr / CAST(n AS DOUBLE))
                        / sqrt((srr - ((sr * sr) / CAST(n AS DOUBLE))) / (CAST(n AS DOUBLE) - 1.0)))
                       * sqrt(8760.0), 6)
       END AS sharpe,
       CASE WHEN sdown IS NOT NULL AND sdown > 0
            THEN round(((sr / CAST(n AS DOUBLE)) / sqrt(sdown / CAST(n AS DOUBLE)))
                       * sqrt(8760.0), 6)
       END AS sortino,
       round(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS hit_rate
FROM g
"""

QUERIES_MARKET["q_sharpe"] = q_sharpe
ORACLE_MARKET["q_sharpe"] = ORACLE_SHARPE


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing (double exponential) as a truncated FIR
# ---------------------------------------------------------------------------

_HOLT_A, _HOLT_B, _HOLT_TAPS = 0.6, 0.4, 30


def q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol Holt one-step forecast over the hourly closes — the
    trend-aware sibling of q_ema. The 2-state Holt recursion is LTI, so
    it compiles to the same shuffle-free truncated-FIR shape as q_ema
    (matrix-geometric taps, |eig| = sqrt(1-alpha) per lag; at
    alpha=0.6 the dropped tail is ~1e-6 of the kernel). Tap weights
    are driver-computed Python floats inlined into BOTH engines; the
    fold order is pinned (aggregate <-> list_reduce). Independent
    verification: tests/test_market.py checks the kernel against the
    explicit sequential Holt recursion."""
    return ts.holt_fir(
        ts.hourly_close(_ticks(spark, sf_dir)),
        alpha=_HOLT_A, beta=_HOLT_B, taps=_HOLT_TAPS,
    )


def _holt_oracle() -> str:
    ws, den = ts.holt_fir_weights(_HOLT_A, _HOLT_B, _HOLT_TAPS)
    wlist = "[" + ", ".join(repr(w) for w in ws) + "]"
    return f"""
WITH closes AS ({_CLOSES_SQL}),
x AS (
  SELECT symbol, bucket, close,
         row_number() OVER wo AS rn,
         list_reverse(list(CAST(close AS DOUBLE)) OVER wf) AS lags
  FROM closes
  WINDOW wo AS (PARTITION BY symbol ORDER BY bucket),
         wf AS (PARTITION BY symbol ORDER BY bucket ROWS BETWEEN {_HOLT_TAPS - 1} PRECEDING AND CURRENT ROW))
SELECT symbol, bucket, CAST(close AS DOUBLE) AS close,
       round(list_reduce(
               list_transform(range(1, {_HOLT_TAPS + 1}),
                              i -> lags[i] * (CAST({wlist} AS DOUBLE[]))[i]),
               (acc, v) -> acc + v) / {den!r}, 6) AS holt
FROM x WHERE rn >= {_HOLT_TAPS}
"""


ORACLE_HOLT = _holt_oracle()

QUERIES_MARKET["q_holt"] = q_holt
ORACLE_MARKET["q_holt"] = ORACLE_HOLT


# ---------------------------------------------------------------------------
# Forecast evaluation: per-symbol MAE / RMSE / bias of the Holt
# one-step forecast against the next observed close.
# ---------------------------------------------------------------------------


def q_holt_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol accuracy of q_holt's one-step-ahead forecast vs the
    next OBSERVED close (hour gaps eval against the next real bar —
    both engines apply the same convention). Errors are exact decimals:
    the published 6-dp forecast and the close both cast to
    decimal(18,6), so |e|, e and e² sum order-free; MAE/RMSE/bias are
    pinned double epilogues over those sums. Adds one lag window on the
    already-tiny forecast frame — nothing beyond q_holt's plan at
    scale."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    h = ts.holt_fir(
        ts.hourly_close(_ticks(spark, sf_dir)),
        alpha=_HOLT_A, beta=_HOLT_B, taps=_HOLT_TAPS,
    )
    w = Window.partitionBy("symbol").orderBy("bucket")
    e = (
        h.withColumn("nxt", F.lead("close", 1).over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            "symbol",
            (
                F.col("nxt").cast("decimal(18,6)")
                - F.col("holt").cast("decimal(18,6)")
            ).alias("e"),
        )
    )
    g = e.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.col("e"))).alias("_sae"),
        F.sum(F.col("e") * F.col("e")).alias("_sse"),
        F.sum("e").alias("_se"),
    )
    n_d = F.col("n").cast("double")
    return g.select(
        "symbol",
        "n",
        F.round(F.col("_sae").cast("double") / n_d, 6).alias("mae"),
        F.round(F.sqrt(F.col("_sse").cast("double") / n_d), 6).alias("rmse"),
        F.round(F.col("_se").cast("double") / n_d, 6).alias("bias"),
    )


ORACLE_HOLT_EVAL = f"""
WITH h AS ({ORACLE_HOLT}),
e AS (
  SELECT symbol,
         CAST(lead(close, 1) OVER (PARTITION BY symbol ORDER BY bucket)
              AS DECIMAL(18,6))
         - CAST(holt AS DECIMAL(18,6)) AS e
  FROM h
  QUALIFY lead(close, 1) OVER (PARTITION BY symbol ORDER BY bucket) IS NOT NULL),
g AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(abs(e) AS DECIMAL(28,6))) AS sae,
         sum(CAST(e AS DECIMAL(28,6)) * e) AS sse,
         sum(CAST(e AS DECIMAL(28,6))) AS se
  FROM e GROUP BY symbol)
SELECT symbol, n,
       round(CAST(sae AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mae,
       round(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS rmse,
       round(CAST(se AS DOUBLE) / CAST(n AS DOUBLE), 6) AS bias
FROM g
"""

QUERIES_MARKET["q_holt_eval"] = q_holt_eval
ORACLE_MARKET["q_holt_eval"] = ORACLE_HOLT_EVAL


# ---------------------------------------------------------------------------
# TWAP: time-weighted average price per (symbol, day)
# ---------------------------------------------------------------------------


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol daily TWAP — each tick's price weighted by the time
    it was the standing quote (to the next tick, the day's last tick
    to midnight). The complement of VWAP (q_ohlc_candles): volume
    weighting answers "average execution price", time weighting
    "average quoted price" for benchmark/compliance reports.

    Exactness: durations are integer microseconds off ONE
    (symbol, day)-partitioned lead window (ties total-ordered by
    tick_id — a zero-duration first tick, not nondeterminism), price
    is decimal(18,4), so price·dur sums are exact decimals and the
    published TWAP is one pinned double division. Plan: one Exchange
    on (symbol, day) + partial agg — nothing global."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t = _ticks(spark, sf_dir).select(
        "symbol",
        F.to_date("tick_ts").alias("day"),
        F.unix_micros(F.col("tick_ts").cast("timestamp")).alias("us"),
        "tick_id",
        "price",
    )
    day_end = F.unix_micros(F.date_add(F.col("day"), 1).cast("timestamp"))
    w = Window.partitionBy("symbol", "day").orderBy("us", "tick_id")
    d = t.withColumn(
        "dur", F.coalesce(F.lead("us", 1).over(w), day_end) - F.col("us")
    )
    g = d.groupBy("symbol", "day").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.col("price") * F.col("dur")).alias("_pd"),
        F.sum("dur").alias("_d"),
    )
    twap = F.when(
        F.col("_d") > 0,
        F.round(F.col("_pd").cast("double") / F.col("_d").cast("double"), 6),
    )
    return g.select("symbol", "day", "n_ticks", twap.alias("twap"))


ORACLE_TWAP = f"""
WITH t AS (
  SELECT symbol, CAST(tick_ts AS DATE) AS day,
         epoch_us(tick_ts) AS us, tick_id, price
  FROM ({_TICKS_SQL})),
d AS (
  SELECT *,
         coalesce(lead(us, 1) OVER (PARTITION BY symbol, day ORDER BY us, tick_id),
                  epoch_us(CAST(day + 1 AS TIMESTAMP))) - us AS dur
  FROM t),
g AS (
  SELECT symbol, day, CAST(count(*) AS BIGINT) AS n_ticks,
         sum(CAST(price AS DECIMAL(28,4)) * dur) AS pd,
         CAST(sum(dur) AS BIGINT) AS dsum
  FROM d GROUP BY symbol, day)
SELECT symbol, day, n_ticks,
       CASE WHEN dsum > 0
            THEN round(CAST(pd AS DOUBLE) / CAST(dsum AS DOUBLE), 6) END AS twap
FROM g
"""

QUERIES_MARKET["q_twap"] = q_twap
ORACLE_MARKET["q_twap"] = ORACLE_TWAP


def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (r7): the error-free line-rendering reduction —
    min/max/first/last tick per (symbol, pixel bucket), 64 buckets per
    symbol. One broadcast bounds join + one partial-agg groupBy; output
    O(symbols × 64) regardless of tick volume."""
    return ts.m4_downsample(_ticks(spark, sf_dir), width=64)


ORACLE_M4_DOWNSAMPLE = f"""
WITH t AS (
  SELECT symbol, tick_id, price, epoch_us(tick_ts) AS us
  FROM ({_TICKS_SQL})),
b AS (SELECT symbol, min(us) AS t0, max(us) AS t1 FROM t GROUP BY symbol),
j AS (
  SELECT t.*, CAST(((us - t0) * 64) // (t1 - t0 + 1) AS INT) AS px
  FROM t JOIN b USING (symbol)),
agg AS (
  SELECT symbol, px, CAST(count(*) AS BIGINT) AS n_ticks,
         min(struct_pack(us := us, tick_id := tick_id, price := price)) AS f,
         max(struct_pack(us := us, tick_id := tick_id, price := price)) AS l,
         min(price) AS vmin, max(price) AS vmax
  FROM j GROUP BY symbol, px)
SELECT symbol, px, n_ticks,
       f.us AS t_first_us, CAST(f.price AS DOUBLE) AS v_first,
       l.us AS t_last_us,  CAST(l.price AS DOUBLE) AS v_last,
       CAST(vmin AS DOUBLE) AS v_min, CAST(vmax AS DOUBLE) AS v_max
FROM agg
"""

QUERIES_MARKET["q_m4_downsample"] = q_m4_downsample
ORACLE_MARKET["q_m4_downsample"] = ORACLE_M4_DOWNSAMPLE
