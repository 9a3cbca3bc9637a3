"""Replicates the driver's correctness gate locally: every registered
query runs on Spark and its oracle SQL runs on DuckDB over the same
parquet; row count, column names, and order-insensitive values must
match (floats compared at fixed precision)."""

from __future__ import annotations

import datetime as dt
import decimal
import math

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _norm(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return f"b:{v}"
    # Decimals are deliberately NOT coerced to float: the driver's hash
    # distinguishes decimal from double representation (round-1 lesson —
    # coercing here masked 8 real hash failures), so the sim must too.
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.4f}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    return f"{type(v).__name__[0]}:{v}"


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


def _duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = cur.fetchall()
    return sorted(names), sorted(tuple(_norm(row[i]) for i in order) for row in rows)


def test_all_queries_have_oracles_or_are_flagged():
    missing = [n for n in QUERIES if n not in ORACLES]
    # Non-SQL-expressible ops may omit oracles, but they must be the
    # documented ones (rows-only checks), not accidental gaps.
    allowed_rows_only = {n for n in QUERIES if n.startswith(("q_stream_", "q_multimodal_", "q_rest_"))}
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"


def _assert_no_decimal(name, df):
    """The driver's oracle side materializes DECIMAL as float64, so any
    DecimalType reaching a registered query's output schema fails the
    value hash on representation (round-1: 8/50). finalize_decimals
    must keep the published surface decimal-free."""
    import pyspark.sql.types as T

    dec = [f.name for f in df.schema.fields if isinstance(f.dataType, T.DecimalType)]
    assert not dec, f"{name}: DecimalType escapes to final schema: {dec}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_schema(name, spark, sf_dir):
    _assert_no_decimal(name, QUERIES[name](spark, sf_dir))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    _assert_no_decimal(name, df)
    s_cols, s_rows = _spark_rows(df)
    d_cols, d_rows = _duck_rows(duck, ORACLES[name])
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) >= 5
