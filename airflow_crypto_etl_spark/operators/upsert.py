"""Upsert (merge) semantics as DataFrame operators.

The reference implements two conflict policies against Postgres
(SURVEY.md §2.2):
- K7 upsert-ignore — ``ON CONFLICT … DO NOTHING`` (first writer wins);
  dim key ``coin_id`` (`/root/reference/dags/coin_data_pipeline_optimized.py:578-589`),
  fact key ``(coin_id, timestamp)`` (`:652-683`).
- K8 upsert-update — ``ON CONFLICT … DO UPDATE`` (last writer wins);
  gold key ``(dt, coin_id)`` (`:884-941`).

Engine-side, both are *logical* operators over (target ∪ updates): pick
one winner per key by arrival order. Physical plan: one shuffle on the
key; winner selection uses min_by/max_by-style aggregation or a window.
The JDBC serving-layer writer that applies the result transactionally
lives in ``sinks.jdbc_upsert``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _merge(target: DataFrame, updates: DataFrame, keys: list[str], keep_first: bool, tiebreak: str) -> DataFrame:
    t = target.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    order = [F.col("__src").asc() if keep_first else F.col("__src").desc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        t.unionByName(u)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def upsert_ignore(target: DataFrame, updates: DataFrame, keys: list[str], tiebreak: str) -> DataFrame:
    """K7 — first-writer-wins: existing target rows survive; update rows
    land only for keys absent from the target. Equivalent formulation:
    ``target ∪ (updates ⟕anti target)`` — the window form is used so both
    policies share one plan shape."""
    return _merge(target, updates, keys, keep_first=True, tiebreak=tiebreak)


def upsert_update(target: DataFrame, updates: DataFrame, keys: list[str], tiebreak: str) -> DataFrame:
    """K8 — last-writer-wins: update rows replace target rows per key."""
    return _merge(target, updates, keys, keep_first=False, tiebreak=tiebreak)


def dedup_exact(df: DataFrame, keys: list[str], order_col: str | None = None) -> DataFrame:
    """Exact dedup on key columns. With ``order_col`` the kept row is
    deterministic (lowest order_col); without, falls back to Spark's
    dropDuplicates (arbitrary winner — fine when rows are identical)."""
    if order_col is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
