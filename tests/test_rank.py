"""The distributed rank primitive (operators/rank.py) must be an EXACT
twin of the unpartitioned-window forms it replaces — same integers,
same IEEE doubles — while planning only partitioned windows. Ground
truth here is the naive `Window.orderBy(...)` construction itself,
evaluated on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import rank as rk


def unpartitioned_windows(df) -> list[str]:
    """Names of window-style physical operators with an EMPTY partition
    spec in the pre-AQE physical plan — each one is a 'move all rows to
    one partition and sort' at scale."""
    plan = df._jdf.queryExecution().sparkPlan()
    found: list[str] = []
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name in ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec"):
            if node.partitionSpec().isEmpty():
                found.append(name)
        kids = node.children()
        for i in range(kids.length()):
            stack.append(kids.apply(i))
    return found


@pytest.fixture(scope="module")
def per_user(spark, sf_dir):
    """Per-user collapse with a HEAVY value: m_cents == 0 for every
    non-purchasing user — the exact distribution that collapses naive
    quantile bucketing into one giant bucket."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * F.lit(100.0)).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("m_cents"),
    ).cache()
    yield d
    d.unpersist()


def _collected(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "order",
    [
        [("score", True), ("user_id", True)],
        [("score", False), ("user_id", True)],
        [("m_cents", False), ("user_id", True)],  # heavy zeros, desc
    ],
)
def test_ranked_matches_global_row_number(per_user, order):
    oexp = [F.col(c).asc() if a else F.col(c).desc() for c, a in order]
    truth = per_user.withColumn(
        "rn", F.row_number().over(Window.orderBy(*oexp)).cast("long")
    )
    got = rk.ranked(per_user, order, out="rn", buckets=8)
    assert _collected(got, ["user_id", "rn"]) == _collected(truth, ["user_id", "rn"])


def test_ranked_plan_is_partitioned_and_balanced(spark, per_user):
    got = rk.ranked(per_user, [("m_cents", False), ("user_id", True)], buckets=8)
    assert unpartitioned_windows(got) == []
    # a single value carrying half the mass must spread over several
    # buckets via the tiebreak sub-split, not collapse into one
    heavy = spark.range(400).select(
        F.when(F.col("id") < 200, F.lit(0)).otherwise(F.col("id")).alias("m"),
        F.col("id").alias("tid"),
    )
    splits = rk._splits(heavy, [("m", False), ("tid", True)], 8)
    zero_splits = [s for s in splits if s[0] == 0 and s[1] is not None]
    assert len(zero_splits) >= 2, splits
    got2 = rk.ranked(heavy, [("m", False), ("tid", True)], out="rn", buckets=8)
    truth2 = heavy.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("m").desc(), F.col("tid"))).cast("long")
    )
    assert _collected(got2, ["tid", "rn"]) == _collected(truth2, ["tid", "rn"])


def test_ranked_ntile_matches_window_ntile(per_user):
    order = [("score", False), ("user_id", True)]
    truth = per_user.withColumn(
        "t", F.ntile(10).over(Window.orderBy(F.col("score").desc(), F.col("user_id")))
    )
    got = rk.ranked_ntile(per_user, order, 10, out="t", buckets=8)
    assert _collected(got, ["user_id", "t"]) == _collected(truth, ["user_id", "t"])
    assert unpartitioned_windows(got) == []


def test_ranked_ntile_more_tiles_than_rows(spark):
    d = spark.range(3).select(F.col("id").alias("k"))
    got = rk.ranked_ntile(d, [("k", True)], 5, out="t", buckets=4)
    truth = d.withColumn("t", F.ntile(5).over(Window.orderBy("k")))
    assert _collected(got, ["k", "t"]) == _collected(truth, ["k", "t"])


def test_ranked_percent_rank_exact_doubles(per_user):
    order = [("score", True), ("user_id", True)]
    truth = per_user.withColumn(
        "p", F.percent_rank().over(Window.orderBy("score", "user_id"))
    )
    got = rk.ranked_percent_rank(per_user, order, out="p", buckets=8)
    t = {r["user_id"]: r["p"] for r in truth.collect()}
    g = {r["user_id"]: r["p"] for r in got.collect()}
    assert g == t  # bit-exact, not approx


def test_grouped_rank_matches_partitioned_row_number(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    truth = o.withColumn("rn", F.row_number().over(w).cast("long"))
    got = rk.grouped_rank(
        o,
        ["o_orderstatus"],
        [("o_totalprice", False), ("o_orderkey", True)],
        out="rn",
        buckets=8,
    )
    assert _collected(got, ["o_orderkey", "rn"]) == _collected(truth, ["o_orderkey", "rn"])
    assert unpartitioned_windows(got) == []


def test_grouped_cumsum_matches_partitioned_running_sum(per_user):
    d = per_user.withColumn("lang", (F.col("user_id") % 3).cast("int"))
    w = (
        Window.partitionBy("lang")
        .orderBy("score", "user_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    truth = d.withColumn("cum", F.sum("m_cents").over(w).cast("long")).withColumn(
        "total", F.sum("m_cents").over(Window.partitionBy("lang")).cast("long")
    )
    got = rk.grouped_cumsum(
        d,
        ["lang"],
        [("score", True), ("user_id", True)],
        "m_cents",
        out="cum",
        total_out="total",
        buckets=8,
    )
    assert _collected(got, ["user_id", "cum", "total"]) == _collected(
        truth, ["user_id", "cum", "total"]
    )
    assert unpartitioned_windows(got) == []


def test_grouped_percentiles_match_percentile_agg(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    truth = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.05)").alias("lo"),
            F.expr("percentile(value, 0.95)").alias("hi"),
        )
        .collect()
    }
    got_df = rk.grouped_percentiles(
        ev, "event_type", "value", [0.05, 0.95], tiebreak="event_id", buckets=8
    )
    got = {r["event_type"]: (r["p_0_05"], r["p_0_95"]) for r in got_df.collect()}
    assert got == truth  # identical interpolation formula → bit-exact
    assert unpartitioned_windows(got_df) == []


def test_ranked_empty_input(spark):
    d = spark.range(0).select(F.col("id").alias("k"))
    assert rk.ranked(d, [("k", True)], buckets=4).count() == 0
    assert rk.ranked_ntile(d, [("k", True)], 4, buckets=4).count() == 0
    assert rk.ranked_percent_rank(d, [("k", True)], buckets=4).count() == 0


# ---------------------------------------------------------------------------
# Hypothesis laws: the primitive must agree with the naive window form on
# ARBITRARY data. Values are drawn from a tiny range so nearly every
# quantile boundary is a duplicated (heavy) value — the adversarial case
# for the bucket construction — and the tiebreak is made unique so the
# order is total (the primitive's documented contract).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

_RANK_SCHEMA = T.StructType(
    [
        T.StructField("v", T.LongType()),
        T.StructField("tid", T.LongType()),
        T.StructField("g", T.LongType()),
    ]
)

_RANK_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-2, max_value=2),  # v: heavy duplicates
        st.integers(min_value=0, max_value=9),  # tid seed (made unique)
        st.integers(min_value=0, max_value=2),  # g: 3 groups
    ),
    min_size=0,
    max_size=40,
)

_RANK_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _rank_df(spark, rows):
    uniq = [(v, 10 * i + t, g) for i, (v, t, g) in enumerate(rows)]
    return spark.createDataFrame(uniq or [], schema=_RANK_SCHEMA)


@given(rows=_RANK_ROWS, asc=st.booleans(), buckets=st.integers(min_value=1, max_value=6))
@_RANK_SETTINGS
def test_law_ranked_is_row_number(spark, rows, asc, buckets):
    d = _rank_df(spark, rows)
    order = [("v", asc), ("tid", True)]
    oexp = [F.col("v").asc() if asc else F.col("v").desc(), F.col("tid").asc()]
    truth = d.withColumn("rn", F.row_number().over(Window.orderBy(*oexp)).cast("long"))
    got = rk.ranked(d, order, out="rn", buckets=buckets)
    assert _collected(got, ["tid", "rn"]) == _collected(truth, ["tid", "rn"])


@given(rows=_RANK_ROWS, k=st.integers(min_value=1, max_value=7))
@_RANK_SETTINGS
def test_law_ntile_is_window_ntile(spark, rows, k):
    d = _rank_df(spark, rows)
    truth = d.withColumn("t", F.ntile(k).over(Window.orderBy("v", "tid")))
    got = rk.ranked_ntile(d, [("v", True), ("tid", True)], k, out="t", buckets=4)
    assert _collected(got, ["tid", "t"]) == _collected(truth, ["tid", "t"])


@given(rows=_RANK_ROWS, buckets=st.integers(min_value=1, max_value=6))
@_RANK_SETTINGS
def test_law_grouped_rank_is_partitioned_row_number(spark, rows, buckets):
    d = _rank_df(spark, rows)
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("tid").asc())
    truth = d.withColumn("rn", F.row_number().over(w).cast("long"))
    got = rk.grouped_rank(
        d, ["g"], [("v", False), ("tid", True)], out="rn", buckets=buckets
    )
    assert _collected(got, ["tid", "rn"]) == _collected(truth, ["tid", "rn"])


@given(rows=_RANK_ROWS)
@_RANK_SETTINGS
def test_law_grouped_cumsum_is_running_sum(spark, rows):
    d = _rank_df(spark, rows)
    w = (
        Window.partitionBy("g")
        .orderBy("v", "tid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    truth = d.withColumn("cum", F.sum("v").over(w).cast("long")).withColumn(
        "total", F.sum("v").over(Window.partitionBy("g")).cast("long")
    )
    got = rk.grouped_cumsum(
        d, ["g"], [("v", True), ("tid", True)], "v",
        out="cum", total_out="total", buckets=4,
    )
    assert _collected(got, ["tid", "cum", "total"]) == _collected(
        truth, ["tid", "cum", "total"]
    )
