"""JDBC source (S6) — warehouse reads with pushdown and parallelism.

The reference probes Postgres with driver-side scalar SELECTs
(`/root/reference/dags/coin_data_pipeline_optimized.py:961-978,1024-1033`).
Spark-first: `spark.read.jdbc` with either a pushdown query (the
database computes the scalar — right for COUNT-style gates) or a
partitioned range read (parallel extraction — right for bulk loads).

Executed live in tests against the embedded Derby database on Spark's
classpath (tests/test_jdbc_live.py): append + read-back, pushdown count
probe, and a partitioned 4-way parallel range scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_reader_options(
    url: str,
    *,
    query: str | None = None,
    table: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 1000,
    **extra: str,
) -> dict[str, str]:
    """Option dict for a JDBC read. ``query`` pushes computation into the
    database (one partition); ``table`` + partition bounds gives an
    N-way parallel range scan. Mutually exclusive, like Spark itself."""
    if (query is None) == (table is None):
        raise ValueError("exactly one of query= or table= is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if query is not None:
        opts["query"] = query
    else:
        opts["dbtable"] = table  # type: ignore[assignment]
        if partition_column is not None:
            if lower_bound is None or upper_bound is None or num_partitions is None:
                raise ValueError("partitioned read needs lower/upper bounds and num_partitions")
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions),
            )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """S6 — lazy JDBC scan from :func:`jdbc_reader_options` kwargs."""
    return spark.read.format("jdbc").options(**jdbc_reader_options(**kwargs)).load()


def count_probe_sql(table: str, predicate: str | None = None) -> str:
    """The reference's quality-gate probe shape, pushed down whole."""
    where = f" WHERE {predicate}" if predicate else ""
    return f"SELECT COUNT(*) AS n FROM {table}{where}"
