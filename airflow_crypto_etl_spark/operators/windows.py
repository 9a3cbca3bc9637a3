"""Window / time-series operators.

The reference's nearest need is "latest row per key" (implied by the
upsert-ignore on `(coin_id, timestamp)`,
`/root/reference/dags/coin_data_pipeline_optimized.py:669`; SURVEY.md
§2.6), generalized here to the standard time-series window surface the
gold layer exists to serve.

Scale: a window over ``partitionBy(key)`` shuffles once on the key and
sorts within partitions. Hot keys are the hazard — for "latest per key"
specifically, prefer :func:`latest_per_key_agg` (max_by — partial-agg,
no sort, skew-immune) over row_number when no full ranking is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """row_number()-based latest-per-key. ``tiebreak`` makes the winner
    deterministic when timestamps collide (re-run idempotency)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).desc(), F.col(tiebreak).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def earliest_per_key(df: DataFrame, key: str, ts_col: str, tiebreak: str) -> DataFrame:
    """First-writer-wins twin (upsert-ignore semantics, K7)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def latest_per_key_agg(df: DataFrame, key: str, ts_col: str, value_cols: list[str]) -> DataFrame:
    """Skew-immune latest-per-key via max_by: partial-aggregates map-side,
    so one hot key costs O(1) state per task instead of a giant sorted
    partition. Use when only the latest values (not the full row rank)
    are needed."""
    aggs = [F.max(ts_col).alias(ts_col)] + [F.expr(f"max_by({c}, {ts_col})").alias(c) for c in value_cols]
    return df.groupBy(key).agg(*aggs)


def moving_avg(
    df: DataFrame, key: str, order_cols: list[str], measure: str, window_rows: int, round_to: int = 4
) -> DataFrame:
    """Trailing moving average over the previous ``window_rows`` rows
    (frame-spec window, SURVEY.md §2.6). ``order_cols`` must end in a
    unique tiebreaker for deterministic frames."""
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(f"mavg_{measure}", F.round(F.avg(measure).over(w), round_to))


def sessionize(df: DataFrame, key: str, ts_col: str, gap_seconds: int) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when
    the gap to the previous event exceeds ``gap_seconds``; session_id is
    the running count of session starts. Two stacked windows over the
    same (key, ts) partitioning → one shuffle total."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new")


def tumbling_window_agg(df: DataFrame, ts_col: str, duration: str, keys: list[str]) -> DataFrame:
    """Batch tumbling-window aggregate via F.window (same operator the
    streaming variant uses — SURVEY.md §2.10). Emits window_start as a
    plain timestamp column for oracle comparability."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value")
    )
