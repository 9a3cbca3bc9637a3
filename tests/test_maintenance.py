"""Lakehouse maintenance operators: file-level zone maps, range-predicate
file skipping, and compaction planning (operators/maintenance.py).

Exercised against a REAL multi-file parquet table written by the suite
(sorted layout so zone maps have pruning power), and cross-checked
against whole-table truths: stats must re-sum to the table, pruning must
never drop a matching row, compaction bins must partition the file set.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import maintenance as mt
from airflow_crypto_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def table_dir(spark, sf_dir):
    """lineitem range-partitioned by orderkey into 8 sorted files — the
    layout a clustered lake write produces, where zone maps are tight."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    out = tempfile.mkdtemp(prefix="aces_maint_")
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(out)
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_file_stats_resum_to_table(spark, table_dir):
    stats = mt.file_stats(spark, table_dir, ["l_orderkey", "l_quantity"])
    rows = stats.collect()
    li = spark.read.parquet(table_dir)
    assert len(rows) == 8  # one row per physical file
    assert sum(r.n_rows for r in rows) == li.count()
    assert min(r.min_l_orderkey for r in rows) == li.agg(F.min("l_orderkey")).first()[0]
    assert max(r.max_l_orderkey for r in rows) == li.agg(F.max("l_orderkey")).first()[0]
    # byte sizes are the real on-disk sizes
    disk = {
        os.path.join(table_dir, f): os.path.getsize(os.path.join(table_dir, f))
        for f in os.listdir(table_dir)
        if f.endswith(".parquet")
    }
    for r in rows:
        assert disk[r.file_path.removeprefix("file://").removeprefix("file:")] == r.file_bytes


def test_prunable_files_skip_soundness(spark, table_dir):
    """A prunable file must contain NO matching row, and the non-pruned
    files must contain ALL matching rows (skip soundness) — checked by
    re-reading only the surviving files."""
    stats = mt.file_stats(spark, table_dir, ["l_orderkey"])
    li = spark.read.parquet(table_dir)
    lo_v, hi_v = li.approxQuantile("l_orderkey", [0.4, 0.6], 0.0)
    tagged = mt.prunable_files(stats, "l_orderkey", int(lo_v), int(hi_v)).collect()
    keep = [r.file_path for r in tagged if not r.prunable]
    # the sorted-by-orderkey layout must let a 20%-selectivity range
    # skip most of the 8 files
    assert 1 <= len(keep) <= 4
    expected = li.where(F.col("l_orderkey").between(int(lo_v), int(hi_v))).count()
    got = (
        spark.read.parquet(*keep)
        .where(F.col("l_orderkey").between(int(lo_v), int(hi_v)))
        .count()
    )
    assert got == expected > 0


def test_prunable_files_null_zone_map(spark):
    """A file whose zone map is all-NULL for the predicate column cannot
    match a range predicate and is prunable."""
    out = tempfile.mkdtemp(prefix="aces_maint_null_")
    try:
        spark.createDataFrame(
            [(1, None), (2, None)], "id bigint, v bigint"
        ).coalesce(1).write.mode("overwrite").parquet(out)
        stats = mt.file_stats(spark, out, ["v"])
        tagged = mt.prunable_files(stats, "v", 0, 10).collect()
        assert len(tagged) == 1 and tagged[0].prunable
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_compaction_plan_partitions_file_set(spark, table_dir):
    stats = mt.file_stats(spark, table_dir, ["l_orderkey"])
    srows = stats.collect()
    total_bytes = sum(r.file_bytes for r in srows)
    target = total_bytes // 3  # aim for ~3 output files
    plan = mt.compaction_plan(stats, target).collect()
    # bins partition the file set exactly
    assert sum(r.n_files for r in plan) == len(srows)
    assert sum(r.total_bytes for r in plan) == total_bytes
    assert sum(r.total_rows for r in plan) == sum(r.n_rows for r in srows)
    # first-fit: every bin except possibly the last crosses the target
    # only via its final file, so no bin exceeds target + max file size
    max_file = max(r.file_bytes for r in srows)
    for r in plan:
        assert r.total_bytes <= target + max_file
    assert 2 <= len(plan) <= 5


def test_compaction_plan_oversized_file_gets_own_bin(spark):
    """A file already >= target must not drag neighbours into its bin
    past the fence: with target 10, sizes [4, 25, 4] split so the big
    file's bin stays within target + its own size."""
    stats = spark.createDataFrame(
        [("a", 4, 1), ("b", 25, 1), ("c", 4, 1)],
        "file_path string, file_bytes bigint, n_rows bigint",
    )
    plan = {r.bin: r for r in mt.compaction_plan(stats, 10).collect()}
    sizes = sorted(r.total_bytes for r in plan.values())
    assert sum(sizes) == 33
    # the 25-byte file must not share a bin with BOTH neighbours
    assert max(r.n_files for r in plan.values()) <= 2


# ---------------------------------------------------------------------------
# Referential-integrity audit + interval-overlap join (registered round-6
# queries; oracle parity is driver-checked, these pin the semantics the
# oracle can't see: detection power and the physical join strategy)
# ---------------------------------------------------------------------------


def test_fk_orphans_detects_injected_breakage(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_pipeline import fk_orphan_counts
    from pyspark.sql import functions as F2

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # consistent warehouse -> zero orphans
    ok = fk_orphan_counts(li, "l_orderkey", orders, "o_orderkey", "e").first()
    assert ok.n_orphans == 0 and ok.ok
    # drop half the parent keys -> orphans appear, totals still add up
    broken = orders.where(F2.col("o_orderkey") % 2 == 0)
    r = fk_orphan_counts(li, "l_orderkey", broken, "o_orderkey", "e").first()
    assert r.n_orphans > 0 and not r.ok and r.n_child == li.count()
    kept = li.join(
        broken.select("o_orderkey"), li.l_orderkey == F2.col("o_orderkey"), "left_semi"
    ).count()
    assert r.n_orphans == li.count() - kept


def test_overlap_pairs_plan_is_partkey_equijoin(spark, sf_dir):
    """The interval join must plan as an equi-join keyed on l_partkey
    (co-partitioned candidate generation) — never a cartesian/BNLJ range
    join, which is the 100 TB failure mode this query exists to avoid."""
    from airflow_crypto_etl_spark.queries_scale import q_overlap_pairs

    df = q_overlap_pairs(spark, sf_dir)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # symmetric pair count sanity: every unordered pair counted once
    n_pairs = df.agg(F.sum("n_pairs")).first()[0]
    assert n_pairs > 0


def test_index_maintenance_cycle_e2e(spark, sf_dir, tmp_path):
    """The scheduled ANN-index maintenance loop as one job
    (plans/index_maintenance): versioned bootstrap → daily appends →
    health-driven decisions. noop below both thresholds; append
    buildup → COMPACT (new epoch, identical lookups, bookkeeping
    reset); occupancy-skew threshold → RETRAIN (new epoch, lookups
    equal the trained rebuild-per-call path)."""
    from airflow_crypto_etl_spark.operators import similarity as sim
    from airflow_crypto_etl_spark.plans import index_maintenance as im

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(~(F.col("vec_id") % 10).isin([3, 4]))
    root = str(tmp_path / "ivf")
    assert im.current_epoch(root) == -1
    assert im.bootstrap_index(spark, base, root, n_centroids=16, spread=False) == 0
    for b, r in ((1, 3), (2, 4)):
        assert (
            im.append_batch(
                spark, emb.filter(F.col("vec_id") % 10 == r), root, b, spread=False
            )
            == 0
        )
    # below both thresholds -> noop, stats still published
    out = im.maintenance_cycle(
        spark, emb, root, compact_after_batches=8, retrain_spread=1e9, spread=False
    )
    assert out["action"] == "noop" and out["epoch"] == 0
    assert out["stats"]["n_append_batches"] == 2
    batch = emb.filter(F.col("vec_id") % 10 == 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    before = sorted(im.lookup(spark, batch, emb, root, spread=False).collect(), key=key)
    # append buildup -> compact: new epoch, pure re-layout, epoch reset
    out = im.maintenance_cycle(
        spark, emb, root, compact_after_batches=2, retrain_spread=1e9, spread=False
    )
    assert out["action"] == "compact" and out["epoch"] == 1
    after = sorted(im.lookup(spark, batch, emb, root, spread=False).collect(), key=key)
    assert [tuple(r) for r in before] == [tuple(r) for r in after]
    assert len(after) > 0
    out = im.maintenance_cycle(
        spark, emb, root, compact_after_batches=2, retrain_spread=1e9, spread=False
    )
    assert out["action"] == "noop"  # compaction consumed the append epoch
    # occupancy-skew threshold -> retrain: lookups through the live
    # version now equal the trained rebuild-per-call path
    out = im.maintenance_cycle(
        spark, emb, root, compact_after_batches=99, retrain_spread=0.0, spread=False
    )
    assert out["action"] == "retrain" and out["epoch"] == 2
    got = sorted(im.lookup(spark, batch, emb, root, spread=False).collect(), key=key)
    trained = sim.ivf_centroids_trained(emb, n_centroids=16, metric="cos", spread=False)
    want = sorted(
        sim.ivf_batch_lookup(
            emb, batch, k=10, n_centroids=16, n_probe=4, spread=False,
            centroids=trained,
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
