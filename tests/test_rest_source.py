"""REST source: driver-side extract shape and the Spark 4 Python
DataSource (pages as partitions) with canned records."""

from __future__ import annotations

import json

from airflow_crypto_etl_spark.sources import rest


def fake_fetcher(page: int, per_page: int) -> list[dict]:
    return [
        {
            "id": f"coin{page}_{i}",
            "symbol": f"c{i}",
            "name": f"Coin {i}",
            "current_price": 100.0 * page + i,
            "market_cap": 1e9 + i,
            "last_updated": "2026-01-13T04:16:20.832Z",
            "extra_field_dropped_by_schema": True,
        }
        for i in range(per_page)
    ]


def test_fetch_to_dataframe(spark):
    df = rest.fetch_to_dataframe(spark, fake_fetcher, pages=2, per_page=5)
    assert df.count() == 10
    assert df.schema == rest.COIN_MARKET_SCHEMA
    assert df.filter("id = 'coin2_4'").collect()[0]["current_price"] == 204.0


def test_paged_datasource_partitions(spark):
    assert rest.HAS_DATASOURCE_API, "Spark 4 expected in this environment"
    assert rest.register_rest_source(spark)
    canned = {str(p): fake_fetcher(p, 3) for p in (1, 2, 3)}
    df = (
        spark.read.format("paged_rest")
        .option("pages", "3")
        .option("per_page", "3")
        .option("canned_json", json.dumps(canned))
        .load()
    )
    assert df.count() == 9
    # pages are real input partitions → parallel fetch
    assert df.rdd.getNumPartitions() == 3
