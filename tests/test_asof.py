"""As-of join: semantics (both strategies, inner asof, duplicate left
rows, directions) and the scale plan (one shuffle per side keyed on
``on``, no pair materialization)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators.joins import asof_join
from tests.test_plans import n_exchanges, plan_of


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:05"), 1),
            ("A", _ts("2026-01-01T10:00:05"), 2),  # duplicate key+ts, distinct id
            ("A", _ts("2026-01-01T09:59:00"), 3),  # before any quote -> dropped (inner)
            ("B", _ts("2026-01-01T10:01:00"), 4),
            ("C", _ts("2026-01-01T10:00:00"), 5),  # key with no quotes -> dropped
        ],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:00"), 100.0),
            ("A", _ts("2026-01-01T10:00:04"), 101.0),
            ("A", _ts("2026-01-01T10:00:06"), 102.0),
            ("B", _ts("2026-01-01T10:00:30"), 200.0),
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


@pytest.mark.parametrize("strategy", ["merge", "pairs"])
def test_asof_backward_semantics(spark, trades_quotes, strategy):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        right_cols=["px"], strategy=strategy,
    )
    got = {r.trade_id: r.r_px for r in out.collect()}
    # duplicate left rows each keep their own match (round-1 ADVICE:
    # the all-left-columns window collapsed them)
    assert got == {1: 101.0, 2: 101.0, 4: 200.0}


@pytest.mark.parametrize("strategy", ["merge", "pairs"])
def test_asof_forward_semantics(spark, trades_quotes, strategy):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="ts",
        right_cols=["px"], direction="forward", strategy=strategy,
    )
    got = {r.trade_id: r.r_px for r in out.collect()}
    assert got == {1: 102.0, 2: 102.0, 3: 100.0}  # B has no quote >= 10:01


def test_asof_exact_match_included(spark, trades_quotes):
    trades, quotes = trades_quotes
    exact = trades.filter(F.col("trade_id") == 1).withColumn(
        "ts", F.lit(_ts("2026-01-01T10:00:04")).cast("timestamp")
    )
    out = asof_join(exact, quotes, on="sym", left_ts="ts", right_ts="ts", right_cols=["px"])
    assert out.collect()[0].r_px == 101.0


def test_asof_merge_plan_one_shuffle_per_side(spark, sf_dir):
    """The 100 TB contract: cogrouped merge_asof shuffles each input
    exactly once, keyed on the join key, and never materializes the
    (left × prior-right) pairs."""
    from airflow_crypto_etl_spark.queries import q_asof_join

    df = q_asof_join(spark, sf_dir)
    p = plan_of(spark, df)
    assert "FlatMapCoGroupsInPandas" in p, p
    assert n_exchanges(p) == 2, p  # one per side, both on user_id
    assert "hashpartitioning(user_id" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


@pytest.mark.parametrize("strategy", ["merge", "pairs"])
def test_asof_null_keys_and_timestamps_dropped(spark, trades_quotes, strategy):
    """NULL join keys / timestamps never match in either strategy (the
    merge path used to crash inside pd.merge_asof on null keys)."""
    trades, quotes = trades_quotes
    trades_n = trades.unionByName(
        spark.createDataFrame(
            [(None, _ts("2026-01-01T10:00:05"), 90), ("A", None, 91)],
            "sym string, ts timestamp, trade_id int",
        )
    )
    quotes_n = quotes.unionByName(
        spark.createDataFrame([("A", None, 999.0)], "sym string, ts timestamp, px double")
    )
    out = asof_join(
        trades_n, quotes_n, on="sym", left_ts="ts", right_ts="ts",
        right_cols=["px"], strategy=strategy,
    )
    got = {r.trade_id: r.r_px for r in out.collect()}
    assert got == {1: 101.0, 2: 101.0, 4: 200.0}  # null rows contributed nothing
