"""JDBC serving-layer writers with upsert semantics (K6-K8).

The reference loads Postgres three ways (SURVEY.md §2.2): row-by-row
INSERT (`/root/reference/dags/crypto_etl_dag.py:103-107`), batched
upsert-ignore (`dags/coin_data_pipeline_optimized.py:578-589,652-683`)
and batched upsert-update (`:884-941`), all via psycopg2
``execute_values(page_size=1000)``.

Spark has no native JDBC upsert, so the engine offers:

1. ``append_jdbc`` — plain ``df.write.jdbc`` with batchsize (replaces
   K6; Spark batches inserts per partition, the reference's
   "optimized" batching for free).
2. ``upsert_foreach_partition`` — executor-side ``ON CONFLICT`` batches
   via psycopg2, one connection per partition, ``execute_values``-style
   paging. This is the real serving-layer path; it is import-gated
   because the driver image has no psycopg2/Postgres (the SQL-building
   and row-batching logic is pure-Python and unit-tested without a DB).
3. Logical fallback: resolve conflicts in Spark first
   (operators.upsert.upsert_ignore/upsert_update) and append the
   winners — exactly-once per key when the target starts empty.

Scale: per-partition connections mean write parallelism ==
``df.rdd.getNumPartitions()``; coalesce to what the database can absorb
(the 1000-row page is the reference's constant; here it's an argument).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row

try:
    import psycopg2  # noqa: F401
    from psycopg2.extras import execute_values  # noqa: F401

    HAS_PSYCOPG2 = True
except ImportError:
    HAS_PSYCOPG2 = False


def append_jdbc(df: DataFrame, url: str, table: str, batchsize: int = 1000, **options) -> None:
    """K6 — append via Spark's JDBC writer (batched per partition)."""
    (
        df.write.mode("append")
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .save()
    )


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?$")


def _ident(name: str) -> str:
    """Validate an identifier (optionally schema-qualified) before it is
    interpolated into SQL text. Names come from DataFrame columns and
    caller config, which can be externally sourced — a quote or space
    would break the statement or open an injection surface (round-1
    ADVICE). Strict allowlist beats quoting: these are warehouse
    tables/columns, not arbitrary labels."""
    if not _IDENT_RE.match(name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def build_upsert_sql(
    table: str, columns: list[str], conflict_cols: list[str], update: bool
) -> str:
    """The ON CONFLICT statement the executor batches rows into —
    upsert-ignore (`…optimized.py:669`) or upsert-update (`:923-933`).
    All identifiers are validated against a strict pattern first."""
    table = _ident(table)
    columns = [_ident(c) for c in columns]
    conflict_cols = [_ident(c) for c in conflict_cols]
    collist = ", ".join(columns)
    conflict = ", ".join(conflict_cols)
    if update:
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in conflict_cols)
        action = f"DO UPDATE SET {sets}"
    else:
        action = "DO NOTHING"
    return f"INSERT INTO {table} ({collist}) VALUES %s ON CONFLICT ({conflict}) {action}"


def batch_rows(rows: Iterator[Row], page_size: int) -> Iterator[list[tuple]]:
    """Page an iterator of rows into execute_values-sized batches."""
    page: list[tuple] = []
    for r in rows:
        page.append(tuple(r))
        if len(page) >= page_size:
            yield page
            page = []
    if page:
        yield page


def upsert_foreach_partition(
    df: DataFrame,
    dsn: str,
    table: str,
    conflict_cols: list[str],
    update: bool = False,
    page_size: int = 1000,
    max_parallel: int | None = None,
) -> None:
    """K7/K8 — executor-side batched upsert. One connection per
    partition; ``max_parallel`` coalesces first so the database sees a
    bounded connection count regardless of cluster size."""
    if not HAS_PSYCOPG2:
        raise NotImplementedError(
            "psycopg2 not available in this environment; use the logical upsert "
            "(operators.upsert) + append_jdbc, or install psycopg2 on executors"
        )
    columns = df.columns
    sql = build_upsert_sql(table, columns, conflict_cols, update)
    if max_parallel:
        df = df.coalesce(max_parallel)

    def write_partition(rows: Iterator[Row]) -> None:
        import psycopg2
        from psycopg2.extras import execute_values

        conn = psycopg2.connect(dsn)
        try:
            with conn, conn.cursor() as cur:
                for page in batch_rows(rows, page_size):
                    execute_values(cur, sql, page, page_size=page_size)
        finally:
            conn.close()

    df.foreachPartition(write_partition)
