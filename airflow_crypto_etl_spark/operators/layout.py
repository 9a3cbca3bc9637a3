"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping scans.

A 100 TB fact table is usually range-partitioned on ONE key (date); a
query filtering on a second key (customer) then reads every file. A
Z-order layout interleaves the bits of both keys into one clustering
value, so sorting by it keeps files tight in BOTH dimensions at once —
parquet min/max footer stats then prune most files for either
predicate (the technique Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
originally Morton 1966).

Everything here is integer bit arithmetic generated as ONE SQL string
(engine-portable: a DuckDB twin renders the same bits), evaluated
inside whole-stage codegen — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def zvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """Spark-SQL text of the Morton interleave of two non-negative
    integer expressions (``a`` into odd bit positions, ``b`` even).
    Values are masked to ``bits`` bits first, so the result fits in
    ``2*bits`` bits of a BIGINT."""
    mask = (1 << bits) - 1
    am, bm = f"(cast({a} as bigint) & {mask})", f"(cast({b} as bigint) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({am}, {i}) & 1, {2 * i + 1})")
        terms.append(f"shiftleft(shiftright({bm}, {i}) & 1, {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zvalue_duck_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of :func:`zvalue_sql` (same value, same inputs)."""
    mask = (1 << bits) - 1
    am, bm = f"(CAST({a} AS BIGINT) & {mask})", f"(CAST({b} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def with_zvalue(df: DataFrame, a: str, b: str, bits: int = Z_BITS, out: str = "zval") -> DataFrame:
    return df.withColumn(out, F.expr(zvalue_sql(a, b, bits)))


def zorder_layout(
    df: DataFrame, a: str, b: str, num_files: int = 16, bits: int = Z_BITS
) -> DataFrame:
    """Re-layout ``df`` for two-dimensional data skipping: compute the
    Z-value, range-partition on it (contiguous Z-ranges per output
    file — this is the shuffle that buys every later scan its pruning),
    and sort within partitions so parquet row-group stats are tight
    too. Write the result with any writer; each file's (a, b) min/max
    envelope is then a small sub-rectangle of the key space instead of
    the full range."""
    z = with_zvalue(df, a, b, bits)
    return z.repartitionByRange(num_files, "zval").sortWithinPartitions("zval")
