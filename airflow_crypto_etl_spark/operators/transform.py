"""Projection / rename / cast / derived-column / contract operators.

Reference semantics (SURVEY.md §2.3): the Silver transform projects 6 of
26 raw columns, renames to the contract names, casts types, and
hard-fails on schema violations
(`/root/reference/dags/coin_data_pipeline_optimized.py:401-429`).

Spark-first: all of these are narrow, codegen'd column expressions — no
shuffle, no UDFs. Catalyst folds `select`+`rename`+`cast` chains into a
single Project over the scan, and pushes the column pruning into the
parquet ReadSchema, so a 6-of-26 projection reads only 6 columns at rest.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: list[str]) -> DataFrame:
    """P1 — column pruning (`…optimized.py:401-403`)."""
    return df.select(*columns)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P2 — bulk rename (`…optimized.py:403-409`). Single Project node."""
    return df.select(*[F.col(c).alias(mapping.get(c, c)) for c in df.columns])


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """P3 — type casts (`…optimized.py:411-413`). Under ANSI mode (Spark 4
    default) a bad cast fails the job, matching pyarrow ``safe=True``."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})


def derive(df: DataFrame, columns: Mapping[str, Column]) -> DataFrame:
    """P4 — derived/literal columns, e.g. ``dt=lit(ds)``
    (`…optimized.py:807`)."""
    return df.withColumns(dict(columns))


def enforce_contract(
    df: DataFrame,
    not_null: list[str] = (),
    positive: list[str] = (),
    non_negative: list[str] = (),
) -> DataFrame:
    """P7 — hard schema/value contract.

    The reference aborts the Silver task when any row violates
    ``SILVER_SCHEMA_V1`` (`…optimized.py:20-27,419-429`). Distributed
    equivalent: attach per-row ``assert_true`` guards; any violating row
    fails the job at execution time, executor-side, with no extra pass
    over the data (the check rides along inside codegen).
    """
    # The guard is woven INTO each checked column (when(assert_true(c)
    # IS NULL, col)) rather than emitted as a separate dropped column —
    # a dropped check column would be pruned by Catalyst and the
    # contract would silently not run.
    conds: dict[str, list] = {}
    for c in not_null:
        conds.setdefault(c, []).append((F.col(c).isNotNull(), f"contract: {c} must not be null"))
    for c in positive:
        conds.setdefault(c, []).append((F.col(c) > 0, f"contract: {c} must be > 0"))
    for c in non_negative:
        conds.setdefault(c, []).append((F.col(c) >= 0, f"contract: {c} must be >= 0"))
    guarded = {}
    for c, cks in conds.items():
        col = F.col(c)
        for cond, msg in cks:
            col = F.when(F.assert_true(cond, F.lit(msg)).isNull(), col)
        guarded[c] = col
    return df.withColumns(guarded) if guarded else df


def contract_violations(
    df: DataFrame,
    not_null: list[str] = (),
    positive: list[str] = (),
    non_negative: list[str] = (),
) -> DataFrame:
    """Non-aborting contract check: returns the violating rows (empty ⇒
    contract holds). The audit-report twin of :func:`enforce_contract`."""
    viol = F.lit(False)
    for c in not_null:
        viol = viol | F.col(c).isNull()
    for c in positive:
        viol = viol | ~(F.col(c) > 0)
    for c in non_negative:
        viol = viol | ~(F.col(c) >= 0)
    return df.filter(viol)
