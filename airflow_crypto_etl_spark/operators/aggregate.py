"""Aggregation operators.

Reference semantics (SURVEY.md §2.5): the Gold build is a
groupBy-multi-aggregate — per key: avg/min/max/avg
(`/root/reference/dags/coin_data_pipeline_optimized.py:795-804`), plus a
date-truncated variant (`:703-715`, commented SQL) and scalar/conditional
counts used as quality gates (`:961-974`).

Spark-first: `groupBy().agg()` compiles to a partial (map-side) +
final hash aggregate — the shuffle carries only one row per (partition,
group), not the input. That partial-aggregation property is exactly what
makes the daily Gold rollup viable at 100 TB: the shuffle volume is
O(groups), not O(rows). Nothing here needs a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gold_daily_metrics(
    df: DataFrame,
    keys: list[str],
    price_col: str,
    volume_col: str,
    round_to: int | None = 4,
) -> DataFrame:
    """A1 — the flagship Gold rollup: per key avg/min/max(price), avg(volume),
    count. Mirrors `build_gold_coin_daily_minio` (`…optimized.py:795-804`).

    ``round_to`` pins float results to a fixed precision so re-runs on
    different partitionings (different fp summation order) stay
    hash-stable — the engine's analog of the reference's idempotent
    partition overwrite.
    """
    r = (lambda c: F.round(c, round_to)) if round_to is not None else (lambda c: c)
    return df.groupBy(*keys).agg(
        r(F.avg(price_col)).alias("avg_price"),
        F.min(price_col).alias("min_price"),
        F.max(price_col).alias("max_price"),
        r(F.avg(volume_col)).alias("avg_volume"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def daily_by_date(
    df: DataFrame, key: str, ts_col: str, measure: str, round_to: int = 4
) -> DataFrame:
    """A2 — group by (key, DATE(ts)) (`…optimized.py:703-715`)."""
    return (
        df.groupBy(F.col(key), F.to_date(F.col(ts_col)).alias("date"))
        .agg(
            F.round(F.avg(measure), round_to).alias("avg_measure"),
            F.min(measure).alias("min_measure"),
            F.max(measure).alias("max_measure"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def conditional_counts(df: DataFrame, conds: dict[str, Column]) -> DataFrame:
    """A3 — one row of named conditional counts (quality-gate probes,
    `…optimized.py:961-974`): count(*) plus count-if per condition.
    One pass, one partial+final aggregate — replaces N separate
    SELECT COUNT(*) round-trips in the reference."""
    aggs = [F.count(F.lit(1)).alias("n_total")]
    aggs += [F.sum(F.when(c, 1).otherwise(0)).alias(name) for name, c in conds.items()]
    return df.agg(*aggs)


def rollup_agg(df: DataFrame, keys: list[str], measure: str, round_to: int = 4) -> DataFrame:
    """Hierarchical subtotals (capability extension, SURVEY.md §2.5 note:
    the reference lacks grouping sets; Spark gives them natively)."""
    return df.rollup(*keys).agg(
        F.round(F.sum(measure), round_to).alias("sum_measure"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def cube_agg(df: DataFrame, keys: list[str], measure: str, round_to: int = 4) -> DataFrame:
    return df.cube(*keys).agg(
        F.round(F.sum(measure), round_to).alias("sum_measure"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def pivot_agg(
    df: DataFrame, key: str, pivot_col: str, pivot_values: list[str], measure: str, round_to: int = 4
) -> DataFrame:
    """Pivot with *explicit* pivot values — omitting them forces an extra
    distinct-scan job to discover the domain, a full pass at scale."""
    out = df.groupBy(key).pivot(pivot_col, pivot_values).agg(F.round(F.sum(measure), round_to))
    return out
