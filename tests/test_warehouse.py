"""Warehouse layer: GE-suite compilation against the real reference
suite JSON, dim/fact builds, upsert loads, serving star query."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from airflow_crypto_etl_spark import checks
from airflow_crypto_etl_spark.plans import medallion, warehouse

from reference_lake import bronze_records

DS = "2026-01-13"
GE_SUITE = "/root/reference/great_expectations/expectations/coin_data_suite.json"


@pytest.fixture(scope="module")
def silver(spark):
    return medallion.silver_transform(
        medallion.bronze_ingest(spark, bronze_records(DS))
    ).cache()


def test_reference_ge_suite_passes_on_silver(spark, silver):
    suite = json.load(open(GE_SUITE))
    exps = checks.from_great_expectations(silver, suite)
    assert len(exps) == 4  # 2 not-null + 2 greater-than survive as row checks
    checks.enforce(silver, exps)  # structural checks already ran in compile


def test_reference_ge_suite_fails_on_drifted_schema(spark, silver):
    suite = json.load(open(GE_SUITE))
    with pytest.raises(checks.CheckFailure, match="does not exist"):
        checks.from_great_expectations(silver.drop("coin_id"), suite)
    with pytest.raises(checks.CheckFailure, match="expected type float"):
        checks.from_great_expectations(
            silver.withColumn("price_usd", F.col("price_usd").cast("string")), suite
        )


def test_dim_fact_build_and_load(spark, silver):
    dim = warehouse.build_dimension(silver)
    assert dim.count() == 100
    fact = warehouse.build_fact(silver)
    assert fact.count() == 100
    assert fact.select("id").distinct().count() == 100  # surrogate uniqueness
    # upsert-ignore: re-loading the same day adds nothing
    dim2 = warehouse.load_dimension(dim, warehouse.build_dimension(silver))
    assert dim2.count() == 100
    fact2 = warehouse.load_fact(fact, warehouse.build_fact(silver))
    assert fact2.count() == 100


def test_serving_star_query(spark, silver):
    dim = warehouse.build_dimension(silver)
    fact = warehouse.build_fact(silver)
    out = warehouse.serving_star_query(fact, dim)
    rows = {r["coin_id"]: r for r in out.collect()}
    assert len(rows) == 100
    btc = rows["bitcoin"]
    assert btc["name"] == "Bitcoin" and btc["n_observations"] == 1
    assert btc["min_price_usd"] == btc["max_price_usd"]


def test_build_upsert_sql_rejects_unsafe_identifiers():
    import pytest as _pytest

    from airflow_crypto_etl_spark.sinks.jdbc_upsert import build_upsert_sql

    # schema-qualified and ordinary identifiers pass
    assert "INSERT INTO gold.coins" in build_upsert_sql(
        "gold.coins", ["coin_id", "price"], ["coin_id"], update=True
    )
    for bad in ['coins"; DROP TABLE x; --', "coins table", "1coins", "a.b.c"]:
        with _pytest.raises(ValueError, match="unsafe SQL identifier"):
            build_upsert_sql(bad, ["coin_id"], ["coin_id"], update=False)
    with _pytest.raises(ValueError):
        build_upsert_sql("coins", ["price; --"], ["price; --"], update=False)
