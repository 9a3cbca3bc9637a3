"""Market time-series operators: OHLC candles, VWAP, moving averages,
RSI, Bollinger bands, gap-fill with linear interpolation, and rolling
z-score anomaly detection.

The reference is a crypto-market ETL (its DAGs pull coin tickers and
publish daily price rollups — ``/root/reference/dags/
coin_data_pipeline_optimized.py``, ``crypto_etl_datawarehouse_day10.py``);
these operators are the analytics a user of that pipeline computes
downstream of the Silver price table, re-expressed as Spark built-ins.

Scale design
------------
* Candles are ONE ``groupBy(symbol, bucket)`` with ``min(struct(...))``
  / ``max(struct(...))`` for open/close — lexicographic struct min is a
  partial-aggregatable map-side combine, so the fact table shuffles
  once, already reduced to per-(symbol, bucket) partials. No window
  sort over raw ticks.
* The indicator operators (SMA / RSI / Bollinger / z-score) run over
  the CANDLE series, not the tick stream — cardinality symbols ×
  buckets, tiny relative to the input — with ``ROWS BETWEEN`` frames
  partitioned by symbol: one shuffle on symbol, sequential frame scan.
* Numeric portability follows the repo's decimal discipline: prices are
  cast to exact DECIMAL on entry, every multi-row sum happens in
  decimal (order-insensitive), and only single final expressions (one
  division, sqrt, interpolation) run in IEEE double with a fixed
  operation order mirrored verbatim by the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact price decimal: the source `value` column carries 2dp prices in
# a double; cast-to-decimal(18,4) round-trips them exactly on both
# engines (the stored double is never at a half-ulp rounding boundary
# of the 4dp grid).
PRICE_DEC = "decimal(18,4)"
ROUND_DP = 6  # final-double publication rounding


def with_market_cols(
    ev: DataFrame,
    ts_col: str = "ts",
    price_col: str = "value",
    symbol_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Normalize a tick table to (symbol, bucket, ts, tick_id, price,
    volume). Volume is synthesized deterministically from the tick id
    (the test tables carry no volume column); real feeds pass their own
    volume through by pre-naming it ``volume``."""
    vol = (
        F.col("volume").cast("bigint")
        if "volume" in ev.columns
        else (F.col(id_col) % F.lit(7) + F.lit(1)).cast("bigint")
    )
    return ev.select(
        F.col(symbol_col).alias("symbol"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        F.col(ts_col).alias("tick_ts"),
        F.col(id_col).alias("tick_id"),
        F.col(price_col).cast(PRICE_DEC).alias("price"),
        vol.alias("volume"),
    )


def ohlc(ticks: DataFrame, keep_pv: bool = False, mergeable: bool = False) -> DataFrame:
    """OHLC candles + VWAP per (symbol, bucket) in ONE aggregation.

    Open/close are the price fields of the lexicographic min/max of
    struct(tick_ts, tick_id, price) — an argmin/argmax that partial-
    aggregates map-side (tick_id breaks timestamp ties
    deterministically). VWAP divides two exact decimal sums once, in
    double.

    Plan note: struct min/max is a declarative aggregate over a non-
    mutable buffer type, so Spark picks SortAggregate (min_by/max_by
    land on the same plan) — the pre-shuffle sort is per-partition,
    spillable, and the exchange still carries only per-(symbol, bucket)
    partials, which is the standard distributed argmin shape; the
    shuffle, not the local sort, is the scale bound.
    """
    # decimal(18,0) bounds the product at precision 37 in both engines
    # while covering real-feed volumes (decimal(8,0) would overflow —
    # an ANSI ArithmeticException — at volume >= 10^8)
    pv = F.col("price") * F.col("volume").cast("decimal(18,0)")
    out = ticks.groupBy("symbol", "bucket").agg(
        F.min(F.struct("tick_ts", "tick_id", "price")).alias("_f"),
        F.max(F.struct("tick_ts", "tick_id", "price")).alias("_l"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.sum("volume").alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(pv).alias("_pv"),
    )
    vwap = _safe_vwap()
    cols = [
        F.col("symbol"),
        F.col("bucket"),
        F.col("_f.price").alias("open"),
        F.col("high"),
        F.col("low"),
        F.col("_l.price").alias("close"),
        F.col("volume"),
        F.col("n_trades"),
        vwap.alias("vwap"),
    ]
    if keep_pv or mergeable:
        # exact decimal Σ(price·volume) — the mergeable partial a
        # coarser rollup needs to recompute VWAP losslessly
        cols.append(F.col("_pv").alias("pv"))
    if mergeable:
        # full argmin/argmax structs (extreme tick keys + price): the
        # provenance a same-bucket cross-batch merge re-elects from
        cols += [F.col("_f").alias("open_s"), F.col("_l").alias("close_s")]
    return out.select(*cols)


def hourly_close(ticks: DataFrame) -> DataFrame:
    """Per-(symbol, bucket) close series — the indicator input."""
    return ticks.groupBy("symbol", "bucket").agg(
        F.max(F.struct("tick_ts", "tick_id", "price")).alias("_l")
    ).select("symbol", "bucket", F.col("_l.price").alias("close"))


def _series_window() -> Window:
    return Window.partitionBy("symbol").orderBy("bucket")


def _safe_vwap() -> Column:
    """VWAP = Σ(price·volume)/Σ(volume), NULL when the bucket's volume
    is zero (a real feed can deliver zero-volume ticks; an unguarded
    double division raises under Spark's default ANSI mode)."""
    return F.when(F.col("volume") == 0, None).otherwise(
        F.round(F.col("_pv").cast("double") / F.col("volume").cast("double"), ROUND_DP)
    )


def _pearson(num: Column, dx: Column, dy: Column) -> Column:
    """Shared Pearson epilogue: r from the (n·Σxy − ΣxΣy) numerator and
    the two scaled variance terms, NULL on zero variance."""
    return F.when((dx <= 0.0) | (dy <= 0.0), None).otherwise(
        F.round(num / F.sqrt(dx * dy), ROUND_DP)
    )


def _power_sum_terms() -> tuple[Column, Column, Column]:
    """(num, dx, dy) from the six standard power-sum columns n/_sx/_sy/
    _sxx/_syy/_sxy — the inputs both correlation operators share."""
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    return n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy


def sma_crossover(closes: DataFrame, fast: int = 5, slow: int = 20) -> DataFrame:
    """Fast/slow simple moving averages over the close series plus the
    golden-cross signal. Frame sums stay decimal (order-insensitive);
    each SMA is one double division, published rounded."""
    base = _series_window()
    w_fast = base.rowsBetween(-(fast - 1), 0)
    w_slow = base.rowsBetween(-(slow - 1), 0)
    rn = F.row_number().over(base)

    def _sma(w: Window, n: int) -> Column:
        return F.round(F.sum("close").over(w).cast("double") / F.lit(n).cast("double"), ROUND_DP)

    out = (
        closes.withColumn("rn", rn)
        .withColumn("sma_fast", _sma(w_fast, fast))
        .withColumn("sma_slow", _sma(w_slow, slow))
        .filter(F.col("rn") >= slow)  # full frames only: partial-frame rows differ per engine width
    )
    return out.select(
        "symbol",
        "bucket",
        F.col("close").alias("close"),
        "sma_fast",
        "sma_slow",
        (F.col("sma_fast") > F.col("sma_slow")).cast("int").alias("golden"),
    )


def rsi_cutler(closes: DataFrame, periods: int = 14) -> DataFrame:
    """Cutler's RSI: simple (not Wilder-smoothed) averages of gains and
    losses over the trailing `periods` deltas — SMA-based RSI is exact
    under decimal sums, where the recursive Wilder EMA is not portable
    bit-for-bit across engines. Published RSI is one double expression:
    round(100 * g / (g + l), 6)."""
    base = _series_window()
    zero = F.lit("0").cast(PRICE_DEC)
    delta = F.col("close") - F.lag("close", 1).over(base)
    frame = base.rowsBetween(-(periods - 1), 0)
    rn = F.row_number().over(base)
    out = (
        closes.withColumn("rn", rn)
        .withColumn("delta", delta)
        .withColumn("gain", F.when(F.col("delta") > 0, F.col("delta")).otherwise(zero))
        .withColumn("loss", F.when(F.col("delta") < 0, -F.col("delta")).otherwise(zero))
        .withColumn("sum_gain", F.sum("gain").over(frame))
        .withColumn("sum_loss", F.sum("loss").over(frame))
        # first row's delta is NULL → gains/losses well-defined from row 2;
        # full frames start at rn = periods + 1
        .filter(F.col("rn") >= periods + 1)
    )
    g = F.col("sum_gain").cast("double")
    lo = F.col("sum_loss").cast("double")
    rsi = F.when(g + lo == 0.0, None).otherwise(F.round(F.lit(100.0) * g / (g + lo), ROUND_DP))
    return out.select(
        "symbol", "bucket", "close",
        F.col("sum_gain").alias("sum_gain"),
        F.col("sum_loss").alias("sum_loss"),
        rsi.alias("rsi"),
    )


def bollinger(closes: DataFrame, periods: int = 20, width: float = 2.0) -> DataFrame:
    """Bollinger bands over the close series. Sum and sum-of-squares
    accumulate in decimal (exact, order-free); mean / variance / sqrt
    are a fixed-order double epilogue. Variance uses the n·Σx² form
    guarded by greatest(·, 0) against negative epsilon."""
    base = _series_window()
    frame = base.rowsBetween(-(periods - 1), 0)
    rn = F.row_number().over(base)
    n = F.lit(float(periods))
    out = (
        closes.withColumn("rn", rn)
        .withColumn("_s1", F.sum("close").over(frame))
        .withColumn("_s2", F.sum(F.col("close") * F.col("close")).over(frame))
        .filter(F.col("rn") >= periods)
    )
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / n
    var = F.greatest((s2 - s1 * s1 / n) / F.lit(float(periods - 1)), F.lit(0.0))
    sd = F.sqrt(var)
    return out.select(
        "symbol",
        "bucket",
        "close",
        F.round(mean, ROUND_DP).alias("mid"),
        F.round(mean + F.lit(width) * sd, ROUND_DP).alias("upper"),
        F.round(mean - F.lit(width) * sd, ROUND_DP).alias("lower"),
    )


def gapfill_linear(closes: DataFrame, step_seconds: int = 3600) -> DataFrame:
    """Densify the candle series to a complete per-symbol bucket spine
    and fill missing closes by linear interpolation between the nearest
    real observations (edges forward/backward-fill).

    The spine is sequence(min_bucket, max_bucket) exploded per symbol —
    spine cardinality is symbols × buckets, never tick-scale. Neighbor
    lookup is last/first IGNORE NULLS over unbounded frames: one
    shuffle on symbol, two sequential scans, no self-join.

    Step-size bound: sequence() materializes one array per symbol
    before exploding, so elements-per-symbol = span/step must stay in
    the thousands (hourly/daily steps over years — fine). For minute
    steps over long spans, explode a two-level spine instead (days,
    then intra-day offsets) to keep each array bounded at 1440.

    Precondition: every input bucket must lie ON the step grid
    (buckets from `hourly_close` with step_seconds=3600 do, by
    date_trunc construction). An off-grid close matches no spine row in
    the left join and would silently drop — pass the step that matches
    the series' truncation granularity.
    """
    # the spine bounds and the spine join both consume `closes`; without
    # a materialization point Spark executes the candle aggregation
    # TWICE (two full tick scans — plan-audited). The candle series is
    # symbols × buckets (tiny), so a lazy localCheckpoint pins it once;
    # unlike cache(), checkpoint blocks are reclaimed by ContextCleaner
    # when the result DataFrame is dropped — no unpersist obligation.
    closes = closes.localCheckpoint(eager=False)
    bounds = closes.groupBy("symbol").agg(
        F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx")
    )
    spine = bounds.select(
        "symbol",
        F.explode(
            F.sequence("_mn", "_mx", F.expr(f"INTERVAL {step_seconds} SECOND"))
        ).alias("bucket"),
    )
    joined = spine.join(closes, ["symbol", "bucket"], "left")
    # bucket may be ntz or ltz depending on the parquet layout; the cast
    # is wall-clock-preserving under the pinned UTC session timezone
    # floor (not truncate-toward-zero) so off-grid / pre-1970 buckets land
    # in the same sequence cell as the DuckDB floor(epoch/step) oracle and
    # the ohlc_rollup convention above
    hseq = F.floor(
        F.unix_timestamp(F.col("bucket").cast("timestamp")) / F.lit(step_seconds)
    ).cast("bigint")
    base = _series_window()
    w_prev = base.rowsBetween(Window.unboundedPreceding, 0)
    w_next = base.rowsBetween(0, Window.unboundedFollowing)
    known_seq = F.when(F.col("close").isNotNull(), F.col("hseq"))
    out = (
        joined.withColumn("hseq", hseq)
        .withColumn("prev_v", F.last("close", ignorenulls=True).over(w_prev))
        .withColumn("prev_t", F.last(known_seq, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("close", ignorenulls=True).over(w_next))
        .withColumn("next_t", F.first(known_seq, ignorenulls=True).over(w_next))
    )
    pv = F.col("prev_v").cast("double")
    nv = F.col("next_v").cast("double")
    frac = (F.col("hseq") - F.col("prev_t")).cast("double") / (
        F.col("next_t") - F.col("prev_t")
    ).cast("double")
    filled = (
        F.when(F.col("close").isNotNull(), F.col("close").cast("double"))
        .when(F.col("prev_v").isNull(), nv)
        .when(F.col("next_v").isNull(), pv)
        .otherwise(F.round(pv + (nv - pv) * frac, ROUND_DP))
    )
    return out.select(
        "symbol",
        "bucket",
        F.col("close").isNull().cast("int").alias("is_gap"),
        filled.alias("px"),
    )


def rolling_zscore(counts: DataFrame, value_col: str, trailing: int = 24) -> DataFrame:
    """Rolling z-score of an integer measure against its trailing
    window (current row EXCLUDED — the anomaly must not dilute its own
    baseline). Integer sums are exact; mean/variance/sqrt are the same
    fixed-order double epilogue as `bollinger`."""
    base = _series_window()
    frame = base.rowsBetween(-trailing, -1)
    rn = F.row_number().over(base)
    n = F.lit(float(trailing))
    out = (
        counts.withColumn("rn", rn)
        .withColumn("_s1", F.sum(value_col).over(frame))
        .withColumn("_s2", F.sum(F.col(value_col) * F.col(value_col)).over(frame))
        .filter(F.col("rn") >= trailing + 1)
    )
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / n
    sd = F.sqrt(F.greatest((s2 - s1 * s1 / n) / F.lit(float(trailing - 1)), F.lit(0.0)))
    z = F.when(sd == 0.0, None).otherwise(
        F.round((F.col(value_col).cast("double") - mean) / sd, ROUND_DP)
    )
    return out.select(
        "symbol",
        "bucket",
        F.col(value_col).alias("obs"),
        F.round(mean, ROUND_DP).alias("mu"),
        z.alias("z"),
    )


def drawdown(closes: DataFrame) -> DataFrame:
    """Running peak and drawdown-from-peak per symbol. The peak is a
    window max over the unbounded-preceding frame — decimal, exact,
    order-free; the drawdown ratio is one double division of exact
    operands. One shuffle on symbol, sequential scan."""
    base = _series_window()
    w_all = base.rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max("close").over(w_all)
    out = closes.withColumn("peak", peak)
    dd = F.when(F.col("peak") == 0, None).otherwise(
        F.round(
            (F.col("peak").cast("double") - F.col("close").cast("double"))
            / F.col("peak").cast("double"),
            ROUND_DP,
        )
    )
    return out.select("symbol", "bucket", "close", "peak", dd.alias("dd"))


def ema_fir(closes: DataFrame, periods: int = 10, taps: int = 30) -> DataFrame:
    """EMA with an explicit finite impulse response: the recursive EMA
    truncated at `taps` lags. The infinite tail below float precision is
    dropped, which (a) makes the operator exact and portable — each tap
    weight w^i is a double power, each term one multiply, summed in a
    FIXED left-to-right fold via aggregate() over collect_list — and
    (b) is how a shuffle-free windowed EMA is actually computed at
    scale: a length-`taps` ROWS frame instead of an unbounded recursive
    dependency, so partitions stay independent.

    alpha = 2/(periods+1); weights w_i = alpha * (1-alpha)^i, i = 0..taps-1
    (current row first), normalized by their own partial sum so the
    truncated kernel still averages to 1.
    """
    # Tap weights are computed ONCE, driver-side, in Python floats and
    # inlined as identical double literals into both the Spark plan and
    # the oracle SQL — no engine-side pow(), whose last-ulp behavior
    # differs between the JVM and libm. repr() round-trips doubles
    # exactly, so both engines parse bit-identical weights.
    ws, den = ema_fir_weights(periods, taps)
    base = _series_window()
    frame = base.rowsBetween(-(taps - 1), 0)
    rn = F.row_number().over(base)
    # collect_list over a ROWS frame preserves frame order (oldest →
    # newest); reverse() puts the current row first so weight index ==
    # lag distance.
    lags = F.reverse(F.collect_list(F.col("close").cast("double")).over(frame))
    out = (
        closes.withColumn("rn", rn)
        .withColumn("_lags", lags)
        .filter(F.col("rn") >= taps)
    )
    # left-to-right fold: the oracle mirrors it with list_reduce, so the
    # double accumulation order is pinned on both engines; built as ONE
    # SQL string (the dedup.py expression-builder discipline — a
    # taps-literal py4j array per call otherwise)
    return out.select(
        "symbol", "bucket", "close",
        F.round(F.expr(_fir_sql("_lags", ws, den)), ROUND_DP).alias("ema"),
    )


def _fir_sql(lags: str, weights: list[float], den: float) -> str:
    """SQL text of the FIR fold ``fold(zip_with(lags, weights, x*w),
    0.0, acc+v) / den`` — same op order as the Column form it replaces
    (repr round-trips the double weights exactly), ONE parsed string
    instead of a taps-element py4j literal array per call."""
    arr = "array(" + ", ".join(f"{float(w)!r}D" for w in weights) + ")"
    return (
        f"aggregate(zip_with({lags}, {arr}, (x, w) -> x * w), "
        f"cast(0.0 as double), (acc, v) -> acc + v) / {float(den)!r}D"
    )


def ema_fir_weights(periods: int, taps: int) -> tuple[list[float], float]:
    """The FIR kernel: w_i = alpha*(1-alpha)^i by repeated Python-float
    multiplication, plus the left-fold normalizer. Shared by the Spark
    operator and the oracle generator so both inline the same bits."""
    alpha = 2.0 / (periods + 1.0)
    ws: list[float] = []
    w = alpha
    for _ in range(taps):
        ws.append(w)
        w = w * (1.0 - alpha)
    den = 0.0
    for x in ws:
        den = den + x
    return ws, den


def pairwise_corr(closes: DataFrame) -> DataFrame:
    """Cross-series Pearson correlation and OLS beta for every symbol
    pair, over the buckets where BOTH symbols traded (inner time join).

    Shape: self-equi-join on bucket (sym_a < sym_b keeps each unordered
    pair once) → one groupBy(pair) carrying six exact sums → double
    epilogue. For S symbols a bucket fans out to S(S-1)/2 pair rows —
    the inherent cost of a correlation matrix; the shuffle is on
    (pair), never on the raw tick stream, and the sums are DECIMAL so
    the merge order of partial aggregates cannot perturb the result
    (native corr()/covar merge co-moments in partition order — fp-
    nondeterministic under AQE; this form hashes identically
    everywhere).
    """
    # self-join: materialize the candle series once (lazy checkpoint)
    # or the tick aggregation runs once PER SIDE (plan-audited)
    closes = closes.localCheckpoint(eager=False)
    a = closes.select("bucket", F.col("symbol").alias("sym_a"), F.col("close").alias("xa"))
    b = closes.select("bucket", F.col("symbol").alias("sym_b"), F.col("close").alias("xb"))
    pairs = a.join(b, "bucket").filter(F.col("sym_a") < F.col("sym_b"))
    g = pairs.groupBy("sym_a", "sym_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("_sx"),
        F.sum("xb").alias("_sy"),
        F.sum(F.col("xa") * F.col("xa")).alias("_sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("_syy"),
        F.sum(F.col("xa") * F.col("xb")).alias("_sxy"),
    )
    num, dx, dy = _power_sum_terms()
    corr = _pearson(num, dx, dy)
    beta = F.when(dx <= 0.0, None).otherwise(F.round(num / dx, ROUND_DP))
    return g.select("sym_a", "sym_b", "n", corr.alias("corr"), beta.alias("beta"))


def backtest_crossover(closes: DataFrame, fast: int = 5, slow: int = 20) -> DataFrame:
    """Vectorized long/flat backtest of the SMA crossover: hold while
    the PREVIOUS bar's fast SMA is above the slow (lag avoids lookahead
    bias), earn that bar's close-to-close delta while long. Per-bar PnL
    and its running total are decimal-exact window sums over the signal
    series — the whole backtest is two window passes over candle-
    cardinality data, no Python loop, no state."""
    sig = sma_crossover(closes, fast=fast, slow=slow)
    base = _series_window()
    pos = F.lag("golden", 1).over(base)
    ret = F.col("close") - F.lag("close", 1).over(base)
    zero = F.lit("0").cast("decimal(19,4)")
    out = (
        sig.withColumn("pos", pos)
        .withColumn("ret", ret)
        .filter(F.col("pos").isNotNull())
        .withColumn("pnl", F.when(F.col("pos") == 1, F.col("ret")).otherwise(zero))
    )
    w_cum = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    return out.select(
        "symbol",
        "bucket",
        "close",
        "pos",
        F.col("pnl").alias("pnl"),
        F.sum("pnl").over(w_cum).alias("cum_pnl"),
    )


def ohlc_rollup(candles: DataFrame, step_seconds: int = 14400) -> DataFrame:
    """Coarser candles composed from finer candle PARTIALS — open/close
    via struct-argmin/argmax over the fine buckets, high/low/volume/
    trades by direct merge, VWAP recomputed losslessly from the carried
    exact decimal pv sums (requires ``ohlc(..., keep_pv=True)`` input).

    This is the hypertable/continuous-aggregate maintenance shape: a
    day's candles roll up from hourly partials (symbols × 24 rows per
    symbol-day), never rescanning the tick table. Chained rollups
    (1h → 4h → 1d) each merge the previous level's partials.
    """
    # floor, not cast-truncation: truncation rounds toward zero, which
    # misbuckets pre-1970 (negative-epoch) timestamps into the bucket
    # that starts after them (and diverges from SQL floor semantics)
    coarse = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col("bucket").cast("timestamp")) / F.lit(step_seconds))
        * F.lit(step_seconds)
    )
    g = (
        candles.withColumn("bucket4", coarse)
        .groupBy("symbol", "bucket4")
        .agg(
            F.min(F.struct("bucket", "open")).alias("_f"),
            F.max(F.struct("bucket", "close")).alias("_l"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("volume").alias("volume"),
            F.sum("n_trades").alias("n_trades"),
            F.sum("pv").alias("_pv"),
        )
    )
    vwap = _safe_vwap()
    return g.select(
        "symbol",
        F.col("bucket4").alias("bucket"),
        F.col("_f.open").alias("open"),
        "high",
        "low",
        F.col("_l.close").alias("close"),
        "volume",
        "n_trades",
        vwap.alias("vwap"),
    )


def merge_candles(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Incremental candle maintenance: fold a new batch's candle
    partials into a persisted candle table (both in the
    ``ohlc(..., mergeable=True)`` shape). Same-bucket rows from
    different batches re-elect open/close by min/max over the carried
    argmin/argmax structs — whose leading fields are the extreme TICK
    keys, so election order is identical to having seen the raw ticks;
    high/low/volume/trades/pv merge directly. Disjoint buckets pass
    through. This is the daily-ingest shape: historical ticks are never
    rescanned and the merge shuffles candle-cardinality rows only. The
    output stays mergeable, so the fold is associative — any batch
    split of the ticks produces the same table.
    """
    both = existing.unionByName(incoming)
    g = both.groupBy("symbol", "bucket").agg(
        F.min("open_s").alias("_f"),
        F.max("close_s").alias("_l"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.sum("volume").alias("volume"),
        F.sum("n_trades").alias("n_trades"),
        F.sum("pv").alias("_pv"),
    )
    vwap = _safe_vwap()
    return g.select(
        "symbol",
        "bucket",
        F.col("_f.price").alias("open"),
        "high",
        "low",
        F.col("_l.price").alias("close"),
        "volume",
        "n_trades",
        vwap.alias("vwap"),
        F.col("_pv").alias("pv"),
        F.col("_f").alias("open_s"),
        F.col("_l").alias("close_s"),
    )


def autocorr(closes: DataFrame, lags: tuple[int, ...] = (1, 2, 3)) -> DataFrame:
    """Autocorrelation of the close series at small lags, per symbol —
    the same exact-power-sum Pearson machinery as `pairwise_corr`, with
    the pair (x_t, x_{t-k}) built by a window lag instead of a join.
    One window pass per lag over candle-cardinality data unioned into a
    single (symbol, lag) groupBy; n varies per lag (first k rows drop).
    """
    if not lags:
        raise ValueError("autocorr: lags must be a non-empty tuple of positive ints")
    base = _series_window()
    parts = []
    for k in lags:
        parts.append(
            closes.withColumn("y", F.lag("close", k).over(base))
            .filter(F.col("y").isNotNull())
            .withColumn("lag", F.lit(k))
        )
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    g = both.groupBy("symbol", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("close").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("close") * F.col("close")).alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).alias("_syy"),
        F.sum(F.col("close") * F.col("y")).alias("_sxy"),
    )
    num, dx, dy = _power_sum_terms()
    return g.select("symbol", "lag", "n", _pearson(num, dx, dy).alias("acf"))


def rolling_median_channel(closes: DataFrame, periods: int = 20) -> DataFrame:
    """Rolling exact median plus Donchian channel over the close
    series. The median is the sort-based exact percentile evaluated
    per ROWS frame (both engines interpolate (a+b)/2 on identical
    doubles — deterministic); channel bounds are decimal frame min/max;
    the mid is one double average. Full frames only."""
    base = _series_window()
    frame = base.rowsBetween(-(periods - 1), 0)
    rn = F.row_number().over(base)
    med = F.expr("percentile(cast(close as double), 0.5D)")
    out = (
        closes.withColumn("rn", rn)
        .withColumn("med", F.round(med.over(frame), ROUND_DP))
        .withColumn("don_hi", F.max("close").over(frame))
        .withColumn("don_lo", F.min("close").over(frame))
        .filter(F.col("rn") >= periods)
    )
    mid = F.round(
        (F.col("don_hi").cast("double") + F.col("don_lo").cast("double")) / F.lit(2.0),
        ROUND_DP,
    )
    return out.select(
        "symbol", "bucket", "close", "med", "don_hi", "don_lo", mid.alias("don_mid")
    )


def obv(candles: DataFrame) -> DataFrame:
    """On-balance volume over the candle series: volume signed by the
    close-over-close direction, accumulated per symbol. Every term is
    an INTEGER (sign × bigint volume) and the running total is an
    integer window sum — no floating point anywhere, so the result is
    exact on any engine and any partitioning."""
    base = _series_window()
    prev = F.lag("close", 1).over(base)
    direction = (
        F.when(prev.isNull(), 0)
        .when(F.col("close") > prev, 1)
        .when(F.col("close") < prev, -1)
        .otherwise(0)
    )
    w_cum = base.rowsBetween(Window.unboundedPreceding, 0)
    out = candles.withColumn("dirvol", direction * F.col("volume"))
    return out.select(
        "symbol",
        "bucket",
        "close",
        F.col("volume").alias("volume"),
        F.sum("dirvol").over(w_cum).alias("obv"),
    )


def stochastic(closes: DataFrame, periods: int = 14) -> DataFrame:
    """Stochastic oscillator: %K = 100·(close − min)/(max − min) over
    the trailing frame (decimal extremes, one double ratio, NULL on a
    flat frame), %D = the 3-bar average of %K written as explicit
    lag adds — NOT a window sum of doubles, whose accumulation order
    segment-tree implementations may reorder. Full frames only."""
    base = _series_window()
    frame = base.rowsBetween(-(periods - 1), 0)
    rn = F.row_number().over(base)
    hi = F.max("close").over(frame)
    lo = F.min("close").over(frame)
    out = (
        closes.withColumn("rn", rn)
        .withColumn("_hi", hi)
        .withColumn("_lo", lo)
    )
    rng = F.col("_hi").cast("double") - F.col("_lo").cast("double")
    k = F.when(F.col("_hi") == F.col("_lo"), None).otherwise(
        F.round(
            F.lit(100.0) * (F.col("close").cast("double") - F.col("_lo").cast("double")) / rng,
            ROUND_DP,
        )
    )
    out = out.withColumn("k", k)
    k1, k2 = F.lag("k", 1).over(base), F.lag("k", 2).over(base)
    d = F.round((F.col("k") + k1 + k2) / F.lit(3.0), ROUND_DP)
    return out.withColumn("d", d).filter(F.col("rn") >= periods + 2).select(
        "symbol", "bucket", "close", "k", "d"
    )


def atr(candles: DataFrame, periods: int = 14) -> DataFrame:
    """Average True Range over the candle series. True range =
    greatest(high − low, |high − prev_close|, |low − prev_close|) —
    every term a decimal difference, so TR is exact; ATR is the
    `periods`-bar simple average (decimal frame sum, one double
    division). Wilder's recursive smoothing is deliberately replaced by
    the SMA form for cross-engine exactness (same trade as rsi_cutler).
    Full frames only. First bar: greatest() null-skips the prev-close
    terms on both engines, so TR degrades to high − low — the standard
    first-bar convention."""
    base = _series_window()
    prev = F.lag("close", 1).over(base)
    tr = F.greatest(
        F.col("high") - F.col("low"),
        F.abs(F.col("high") - prev),
        F.abs(F.col("low") - prev),
    )
    frame = base.rowsBetween(-(periods - 1), 0)
    rn = F.row_number().over(base)
    out = (
        candles.withColumn("rn", rn)
        .withColumn("tr", tr)
        .filter(F.col("tr").isNotNull())
        .withColumn("_s", F.sum("tr").over(frame))
        .filter(F.col("rn") >= periods + 1)
    )
    atr_col = F.round(F.col("_s").cast("double") / F.lit(float(periods)), ROUND_DP)
    return out.select("symbol", "bucket", "close", F.col("tr").alias("tr"), atr_col.alias("atr"))


def macd(
    closes: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    taps: int = 30,
    signal_taps: int = 15,
) -> DataFrame:
    """MACD with signal line and histogram, in the FIR form: fast and
    slow EMAs share ONE collect_list lag window (two weight kernels
    over the same array), the MACD line is rounded, and the signal EMA
    folds over the ROUNDED macd series in a second window pass — both
    folds left-to-right with driver-inlined weight literals, so every
    intermediate double is bit-identical cross-engine (the ema_fir
    portability argument, applied twice)."""
    wf, den_f = ema_fir_weights(fast, taps)
    ws, den_s = ema_fir_weights(slow, taps)
    wg, den_g = ema_fir_weights(signal, signal_taps)
    base = _series_window()
    frame = base.rowsBetween(-(taps - 1), 0)
    rn = F.row_number().over(base)
    lags = F.reverse(F.collect_list(F.col("close").cast("double")).over(frame))
    step1 = (
        closes.withColumn("rn", rn)
        .withColumn("_lags", lags)
        .filter(F.col("rn") >= taps)
    )

    step1 = step1.withColumn(
        "macd",
        F.round(
            F.expr(f"({_fir_sql('_lags', wf, den_f)}) - ({_fir_sql('_lags', ws, den_s)})"),
            ROUND_DP,
        ),
    ).select("symbol", "bucket", "close", "macd")
    # second pass: signal = FIR-EMA of the rounded macd series
    base2 = _series_window()
    frame2 = base2.rowsBetween(-(signal_taps - 1), 0)
    rn2 = F.row_number().over(base2)
    mlags = F.reverse(F.collect_list("macd").over(frame2))
    out = (
        step1.withColumn("rn2", rn2)
        .withColumn("_mlags", mlags)
        .withColumn("signal", F.round(F.expr(_fir_sql("_mlags", wg, den_g)), ROUND_DP))
        .filter(F.col("rn2") >= signal_taps)
    )
    return out.select(
        "symbol",
        "bucket",
        "close",
        "macd",
        "signal",
        F.round(F.col("macd") - F.col("signal"), ROUND_DP).alias("histogram"),
    )


def keltner(
    candles: DataFrame, periods: int = 20, taps: int = 30, atr_periods: int = 14, width: float = 2.0
) -> DataFrame:
    """Keltner channel: FIR-EMA midline over the closes ± width × ATR —
    a composition of two existing operators joined on (symbol, bucket).
    Both inputs are published rounded doubles, so the band arithmetic
    is one deterministic add/subtract per row."""
    closes = candles.select("symbol", "bucket", "close")
    mid = ema_fir(closes, periods=periods, taps=taps).select(
        "symbol", "bucket", F.col("ema").alias("mid")
    )
    rng = atr(candles, periods=atr_periods).select("symbol", "bucket", "atr")
    j = mid.join(rng, ["symbol", "bucket"]).join(closes, ["symbol", "bucket"])
    return j.select(
        "symbol",
        "bucket",
        "close",
        "mid",
        F.round(F.col("mid") + F.lit(width) * F.col("atr"), ROUND_DP).alias("upper"),
        F.round(F.col("mid") - F.lit(width) * F.col("atr"), ROUND_DP).alias("lower"),
    )


def holt_fir_weights(alpha: float, beta: float, taps: int) -> tuple[list[float], float]:
    """Holt linear-trend smoothing as a FIR kernel.

    The Holt recursion
        s_t = alpha*x_t + (1-alpha)*(s_{t-1} + b_{t-1})
        b_t = beta*(s_t - s_{t-1}) + (1-beta)*b_{t-1}
    is linear time-invariant in the state (s, b):
        state_t = M @ state_{t-1} + v * x_t,
        M = [[1-a, 1-a], [-a*b, 1-a*b]],  v = [a, a*b]
    so the one-step forecast f_t = s_t + b_t is the FIR
    f_t = sum_k (u^T M^k v) x_{t-k}, u = [1, 1], with the seed term
    decaying as |eig(M)|^t (< 1 for 0 < alpha, beta < 1). Weights are
    built by repeated Python-float multiplication (driver-side, inlined
    as identical literals into both engines — the ema_fir discipline)
    and normalized by their own partial sum so a constant series maps
    to itself despite truncation."""
    ws: list[float] = []
    s, b = alpha, alpha * beta
    for _ in range(taps):
        ws.append(s + b)
        s, b = (
            (1.0 - alpha) * s + (1.0 - alpha) * b,
            (-alpha * beta) * s + (1.0 - alpha * beta) * b,
        )
    den = 0.0
    for x in ws:
        den = den + x
    return ws, den


def holt_fir(
    closes: DataFrame, alpha: float = 0.6, beta: float = 0.4, taps: int = 30
) -> DataFrame:
    """Holt one-step forecast via the truncated FIR kernel of
    :func:`holt_fir_weights` — shuffle-free (a length-`taps` ROWS frame
    per symbol instead of an unbounded recursive dependency), fold
    order pinned exactly as :func:`ema_fir`."""
    ws, den = holt_fir_weights(alpha, beta, taps)
    base = _series_window()
    frame = base.rowsBetween(-(taps - 1), 0)
    rn = F.row_number().over(base)
    lags = F.reverse(F.collect_list(F.col("close").cast("double")).over(frame))
    out = (
        closes.withColumn("rn", rn)
        .withColumn("_lags", lags)
        .filter(F.col("rn") >= taps)
    )
    return out.select(
        "symbol", "bucket", "close",
        F.round(F.expr(_fir_sql("_lags", ws, den)), ROUND_DP).alias("holt"),
    )


def m4_downsample(ticks: DataFrame, width: int = 64) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): split each
    symbol's time range into ``width`` pixel buckets and keep only the
    min, max, first, and last tick per bucket — the four points that
    make a line rendering at ``width`` pixels error-free, reducing any
    tick volume to O(symbols × width) rows.

    Scale shape: one 1-row-per-symbol bounds aggregate broadcast back
    onto the ticks (the tick relation never shuffles for the bounds),
    then ONE partial-aggregatable groupBy (symbol, px) — first/last via
    lexicographic struct min/max on (us, tick_id), deterministic under
    duplicate timestamps because tick_id is unique. Pixel assignment is
    pure integer arithmetic: px = (us - t0) * width div (t1 - t0 + 1),
    in [0, width), identical in any engine (no float rounding)."""
    us = F.unix_micros(F.col("tick_ts").cast("timestamp"))
    t = ticks.select("symbol", "tick_id", "price", us.alias("us"))
    bounds = t.groupBy("symbol").agg(
        F.min("us").alias("t0"), F.max("us").alias("t1")
    )
    j = t.join(F.broadcast(bounds), "symbol").withColumn(
        "px",
        F.expr(f"cast(((us - t0) * {width}) div (t1 - t0 + 1) as int)"),
    )
    point = F.struct("us", "tick_id", "price")
    agg = j.groupBy("symbol", "px").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.min(point).alias("_f"),
        F.max(point).alias("_l"),
        F.min("price").alias("_vmin"),
        F.max("price").alias("_vmax"),
    )
    return agg.select(
        "symbol",
        "px",
        "n_ticks",
        F.col("_f.us").alias("t_first_us"),
        F.col("_f.price").cast("double").alias("v_first"),
        F.col("_l.us").alias("t_last_us"),
        F.col("_l.price").cast("double").alias("v_last"),
        F.col("_vmin").cast("double").alias("v_min"),
        F.col("_vmax").cast("double").alias("v_max"),
    )
