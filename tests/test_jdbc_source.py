"""JDBC source option building (no database in this environment — the
reader construction and pushdown shapes are what's testable)."""

from __future__ import annotations

import pytest

from airflow_crypto_etl_spark.sources import jdbc


def test_query_pushdown_options():
    opts = jdbc.jdbc_reader_options(
        "jdbc:postgresql://db/warehouse", query=jdbc.count_probe_sql("gold", "dt = '2026-01-13'")
    )
    assert opts["query"] == "SELECT COUNT(*) AS n FROM gold WHERE dt = '2026-01-13'"
    assert "dbtable" not in opts


def test_partitioned_range_read_options():
    opts = jdbc.jdbc_reader_options(
        "jdbc:postgresql://db/warehouse",
        table="coin_prices_fact",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["numPartitions"] == "16" and opts["partitionColumn"] == "id"


def test_invalid_combinations_rejected():
    with pytest.raises(ValueError, match="exactly one"):
        jdbc.jdbc_reader_options("jdbc:x", query="SELECT 1", table="t")
    with pytest.raises(ValueError, match="bounds"):
        jdbc.jdbc_reader_options("jdbc:x", table="t", partition_column="id")
