"""Scale-path features: salted skew joins (correctness vs plain join),
bucketed co-located joins (exchange-free plan), stateful streaming
(running totals vs batch ground truth)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import joins as join_ops
from airflow_crypto_etl_spark.sources.tables import load_table
from airflow_crypto_etl_spark.streaming.stateful import running_totals_per_user
from airflow_crypto_etl_spark.streaming.windows import run_available_now, stream_events

from test_plans import n_exchanges, plan_of


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = li.join(o, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("s")
    ).collect()[0]
    salted = join_ops.salted_join(li, o, "k", salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"] and plain["s"] == salted["s"]


def test_salted_join_left_outer(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    half = load_table(spark, sf_dir, "orders").filter("o_orderkey % 2 = 0").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = li.join(half, "k", "left").filter("o_totalprice IS NULL").count()
    salted = join_ops.salted_join(li, half, "k", salt=4, how="left").filter(
        "o_totalprice IS NULL"
    ).count()
    assert plain == salted


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    join_ops.bucketed_tables({"b_lineitem": li, "b_orders": o}, "l_orderkey", n_buckets=8)
    try:
        a = spark.table("b_lineitem")
        b = spark.table("b_orders")
        joined = a.join(b, "l_orderkey")
        p = plan_of(spark, joined)
        assert n_exchanges(p) == 0, p  # co-located: no shuffle at query time
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_stateful_running_totals(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    out = run_available_now(running_totals_per_user(stream), "update")
    got = {r["user_id"]: r for r in out.collect()}
    truth = {
        r["user_id"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(got) == set(truth)
    for uid, t in truth.items():
        g = got[uid]
        assert g["n_events"] == t["n_events"]
        assert abs(g["total_value"] - t["total_value"]) < 1e-6
        assert g["max_value"] == t["max_value"]


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """Sketch aggregates (HLL distinct, quantile sketch) are the
    100 TB path where exact forms would shuffle too much state. Their
    outputs are engine-specific, so they are accuracy-tested here
    rather than oracle-hashed: ±5% of exact."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("p50_approx"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_exact"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]
    assert abs(row["p50_approx"] - row["p50_exact"]) <= max(1.0, 0.05 * row["p50_exact"])


def test_arrow_topk_agrees_with_exact_fold(spark, sf_dir):
    """The vectorized-pandas_udf ANN scorer must return the same
    neighbors as the codegen'd fold (scores to fp-reassociation
    tolerance)."""
    from airflow_crypto_etl_spark.operators import similarity as sim
    from airflow_crypto_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3]
    exact = sim.brute_force_topk(emb, qids, k=5).collect()
    arrow = sim.brute_force_topk_arrow(emb, qids, k=5).collect()
    ex = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact}
    ar = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in arrow}
    assert set(ex) == set(ar)
    assert all(abs(ex[kk] - ar[kk]) < 1e-9 for kk in ex)


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """With broadcast off (forcing a shuffle join), Catalyst's runtime
    bloom-filter rule should plant a might_contain predicate on the big
    side, built from the selective dim side — the row-level semi-join
    reduction that matters when the fact side is 100 TB."""
    from airflow_crypto_etl_spark.sources.tables import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            "o_orderpriority = 'URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "might_contain" in plan.lower()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_zorder_layout_prunes_2d_box(spark, sf_dir, tmp_path):
    """Write the same rows (a) sorted by p_size and (b) sorted by the
    Morton key, then count parquet row groups whose min/max stats overlap
    a price-bucket point predicate. The 1-D size sort cannot prune the
    price dimension; the Z-order layout must touch strictly fewer groups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airflow_crypto_etl_spark.operators.layout import zvalue_sql
    from airflow_crypto_etl_spark.queries_scale import _MORTON_BITS, _ZX, _ZY_SPARK
    from airflow_crypto_etl_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.expr(_ZY_SPARK).alias("pbucket"),
        F.expr(zvalue_sql(_ZY_SPARK, _ZX, bits=_MORTON_BITS)).cast("long").alias("zkey"),
    )
    layouts = {
        "by_size": part.orderBy("p_size", "p_partkey").toPandas(),
        "by_zkey": part.orderBy("zkey", "p_partkey").toPandas(),
    }
    n_rows = len(layouts["by_size"])
    rg_size = max(1, n_rows // 8)
    target = int(layouts["by_size"]["pbucket"].mode().iloc[0])

    def overlapping_groups(path):
        md = pq.ParquetFile(path).metadata
        hit = 0
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
            }["pbucket"]
            if stats.min <= target <= stats.max:
                hit += 1
        return md.num_row_groups, hit

    counts = {}
    for name, pdf in layouts.items():
        path = tmp_path / f"{name}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf), path, row_group_size=rg_size)
        counts[name] = overlapping_groups(path)
    assert counts["by_size"][0] == counts["by_zkey"][0] >= 8
    assert counts["by_zkey"][1] < counts["by_size"][1]


def test_transform_with_state_type_counts(spark, sf_dir):
    """transformWithStateInPandas running counts equal batch group counts.
    Gated: the TWS Python worker protocol needs protobuf, absent here."""
    import pytest

    pytest.importorskip("google.protobuf")
    from airflow_crypto_etl_spark.streaming.stateful import (
        TWS_STATE_STORE_CONF,
        event_type_counts_per_user,
    )

    k, v = TWS_STATE_STORE_CONF
    old = spark.conf.get(k)
    spark.conf.set(k, v)
    try:
        out = run_available_now(
            event_type_counts_per_user(stream_events(spark, sf_dir)), "update"
        )
        got = {
            (r["user_id"], r["event_type"]): r["n_events"]
            for r in out.groupBy("user_id", "event_type")
            .agg(F.max("n_events").alias("n_events"))
            .collect()
        }
        want = {
            (r["user_id"], r["event_type"]): r["n"]
            for r in load_table(spark, sf_dir, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set(k, old)


def test_aqe_skew_join_splits_hot_partition(spark):
    """With one hot key dominating the left side, AQE's OptimizeSkewedJoin
    must split the oversized shuffle partition: final adaptive plan shows
    SortMergeJoin(skew=true) over an `AQEShuffleRead skewed` — the
    runtime answer to key skew that salting solves statically."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 10 < 8, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 500_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan and "skew=true" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_range_partitioned_write_nonoverlapping(spark, sf_dir, tmp_path):
    """repartitionByRange + sortWithinPartitions before write produces
    files with disjoint key ranges — the layout that lets a key-range
    predicate prune whole FILES (coarser than row groups), which is what
    keeps a 100 TB scan from touching most of its inputs."""
    import glob

    import pyarrow.parquet as pq

    from airflow_crypto_etl_spark.sources.tables import load_table

    out = str(tmp_path / "ranged")
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
            }["l_orderkey"]
            mins.append(stats.min)
            maxs.append(stats.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_hll_partial_sketches_union_to_global(spark, sf_dir):
    """HLL sketches aggregated per group then hll_union_agg'd to a global
    estimate — the mergeable-sketch rollup pattern (per-partition /
    per-day sketches unioned instead of recounting raw data). Estimate
    must land within 5% of the exact distinct count."""
    from airflow_crypto_etl_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk")
    )
    est = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    exact = li.select("l_partkey").distinct().count()
    assert abs(est - exact) <= 0.05 * exact


def test_analyze_table_feeds_optimizer_estimates(spark, sf_dir, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS must surface as optimizer
    cardinality estimates (CBO input) — at 100 TB, stats-driven join
    ordering/broadcast decisions are what keep plans sane before AQE's
    runtime correction kicks in."""
    from airflow_crypto_etl_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS cbo_probe")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(
        "cbo_probe"
    )
    spark.sql("ANALYZE TABLE cbo_probe COMPUTE STATISTICS FOR ALL COLUMNS")
    old_cbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        n = load_table(spark, sf_dir, "orders").count()
        stats = (
            spark.table("cbo_probe")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == n
        line = (
            spark.sql("DESC EXTENDED cbo_probe o_orderkey")
            .filter("info_name = 'distinct_count'")
            .collect()
        )
        assert line and int(line[0][1]) > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old_cbo)
        spark.sql("DROP TABLE IF EXISTS cbo_probe")
