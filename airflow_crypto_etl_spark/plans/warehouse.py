"""Warehouse (serving) layer: the star schema from Silver.

Re-expresses the reference's dim/fact split and loads (SURVEY.md §2.2
K6-K9; DDL `/root/reference/dags/coin_data_pipeline_optimized.py:87-104`):

- ``coin_dimension(coin_id PK, name, symbol, category)`` — upsert-ignore
  on coin_id (`:578-589`)
- ``coin_prices_fact(id surrogate, coin_id, price_usd, market_cap,
  timestamp)`` — upsert-ignore on (coin_id, timestamp) (`:652-683`)
- ``gold_coin_daily_metrics`` — upsert-update on (dt, coin_id)
  (`:884-941`)

Engine-side these are logical merges (operators.upsert) producing
DataFrames a JDBC writer (sinks.jdbc_upsert) ships to the database; the
serving-time star join is joins.star_join with a broadcast dimension.

Surrogate keys: the reference uses Postgres SERIAL (`:98`); distributed
equivalent is a deterministic content-derived key or
monotonically_increasing_id (unique but not dense — documented
tradeoff: dense sequences do not scale, they serialize writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import joins as join_ops
from ..operators import upsert as upsert_ops


def build_dimension(silver: DataFrame) -> DataFrame:
    """Distinct coin dimension rows from Silver (K7 source shape)."""
    return (
        silver.select("coin_id", "name", "symbol")
        .distinct()
        .withColumn("category", F.lit(None).cast("string"))
    )


def build_fact(silver: DataFrame) -> DataFrame:
    """Price observations keyed (coin_id, timestamp); surrogate id is
    monotonically_increasing_id (unique per run, not dense)."""
    return silver.select(
        F.monotonically_increasing_id().alias("id"),
        "coin_id",
        "price_usd",
        "market_cap",
        "timestamp",
    )


def load_dimension(target: DataFrame, updates: DataFrame) -> DataFrame:
    """K7 — upsert-ignore on coin_id."""
    return upsert_ops.upsert_ignore(target, updates, keys=["coin_id"], tiebreak="coin_id")


def load_fact(target: DataFrame, updates: DataFrame) -> DataFrame:
    """K7 — upsert-ignore on (coin_id, timestamp)."""
    return upsert_ops.upsert_ignore(
        target, updates, keys=["coin_id", "timestamp"], tiebreak="id"
    )


def load_gold_metrics(target: DataFrame, updates: DataFrame) -> DataFrame:
    """K8 — upsert-update on (dt, coin_id)."""
    return upsert_ops.upsert_update(target, updates, keys=["dt", "coin_id"], tiebreak="coin_id")


def serving_star_query(fact: DataFrame, dim: DataFrame) -> DataFrame:
    """The analytical query the warehouse exists for (SURVEY §2.4 J1):
    per-coin price stats with dimension attributes, broadcast join."""
    joined = join_ops.star_join(fact, [(dim, "coin_id")])
    return joined.groupBy("coin_id", "name", "symbol").agg(
        F.round(F.avg("price_usd"), 4).alias("avg_price_usd"),
        F.min("price_usd").alias("min_price_usd"),
        F.max("price_usd").alias("max_price_usd"),
        F.count(F.lit(1)).alias("n_observations"),
    )
