"""Sink behaviors: dynamic partition overwrite touches only the written
partitions; sidecar row counts come from the write itself; JDBC upsert
SQL/batching logic (DB-free parts)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.sinks import jdbc_upsert, writers
from airflow_crypto_etl_spark.sources.tables import load_table


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    out = str(tmp_path / "t")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    )
    writers.write_partitioned(orders.filter("yr IN (1995, 1996)"), out, ["yr"])
    n95 = spark.read.parquet(out).filter("yr = 1995").count()
    assert n95 > 0
    # overwrite ONLY 1996 with a subset; 1995 must survive untouched
    y96_head = orders.filter("yr = 1996").limit(10)
    writers.write_partitioned(y96_head, out, ["yr"])
    back = spark.read.parquet(out)
    assert back.filter("yr = 1995").count() == n95
    assert back.filter("yr = 1996").count() == 10


def test_sidecar_written_during_write(spark, sf_dir, tmp_path):
    out = str(tmp_path / "s")
    region = load_table(spark, sf_dir, "region").withColumn("dt", F.lit("2026-01-13"))
    meta = writers.write_with_sidecar(region, out, ["dt"], dataset="region", source="test", ds="2026-01-13")
    assert meta["row_count"] == 5
    assert writers.read_sidecar(out)["dataset"] == "region"


def test_upsert_sql_shapes():
    ignore = jdbc_upsert.build_upsert_sql("dim", ["k", "a", "b"], ["k"], update=False)
    assert ignore == "INSERT INTO dim (k, a, b) VALUES %s ON CONFLICT (k) DO NOTHING"
    upd = jdbc_upsert.build_upsert_sql("gold", ["dt", "k", "v"], ["dt", "k"], update=True)
    assert "DO UPDATE SET v = EXCLUDED.v" in upd


def test_batch_rows_pages():
    rows = iter([Row(a=i) for i in range(7)])
    pages = list(jdbc_upsert.batch_rows(rows, 3))
    assert [len(p) for p in pages] == [3, 3, 1]
    assert pages[0][0] == (0,)


def test_upsert_gated_without_psycopg2(spark, sf_dir):
    import pytest

    if jdbc_upsert.HAS_PSYCOPG2:
        pytest.skip("psycopg2 present; gate not applicable")
    region = load_table(spark, sf_dir, "region")
    with pytest.raises(NotImplementedError, match="psycopg2"):
        jdbc_upsert.upsert_foreach_partition(region, "dsn", "t", ["r_regionkey"])


def test_compaction_binpacks_small_files(spark, sf_dir, tmp_path):
    """Fragmented ingest output compacts to the byte-derived file count
    with data intact; an already-compact dir is a no-op."""
    from airflow_crypto_etl_spark.sinks import compaction
    from airflow_crypto_etl_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "fragmented")
    li.repartition(48).write.parquet(path)  # simulate per-micro-batch files
    before_total, before_files = compaction.dir_stats(path)
    assert before_files == 48

    res = compaction.compact_parquet(spark, path, target_mb=1)
    assert not res["skipped"]
    want = max(1, -(-before_total // (1024 * 1024)))
    assert res["after_files"] == want < before_files
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert back.agg({"l_quantity": "sum"}).collect()[0][0] == li.agg({"l_quantity": "sum"}).collect()[0][0]

    again = compaction.compact_parquet(spark, path, target_mb=1)
    assert again["skipped"]


def test_parquet_schema_evolution_mergeschema(spark, sf_dir, tmp_path):
    """Lake schema evolution: a partition written before a column existed
    must coexist with newer partitions — mergeSchema=true reads the
    superset schema with NULLs for the missing column, and the old
    partition keeps pruning correctly."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.sources.tables import load_table

    out = str(tmp_path / "evolving")
    o = load_table(spark, sf_dir, "orders")
    v1 = o.select("o_orderkey", "o_totalprice").withColumn("dt", F.lit("2026-01-01"))
    v2 = (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .withColumn("dt", F.lit("2026-01-02"))
    )
    v1.write.partitionBy("dt").mode("append").parquet(out)
    v2.write.partitionBy("dt").mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "o_orderpriority" in merged.columns
    old = merged.filter(F.col("dt") == "2026-01-01")
    assert old.filter(F.col("o_orderpriority").isNull()).count() == old.count()
    new = merged.filter(F.col("dt") == "2026-01-02")
    assert new.filter(F.col("o_orderpriority").isNotNull()).count() == new.count()
    assert merged.count() == 2 * o.count()
