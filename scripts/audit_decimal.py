"""Audit every registered query's FINAL schema for DecimalType.

The driver's DuckDB oracle materializes decimals as float64, so any
DecimalType that reaches a registered query's output schema diverges at
the value-hash boundary (VERDICT r1 §What's wrong #1-3). Policy: decimal
arithmetic stays internal; the final select emits round(cast(double),4).
"""
from __future__ import annotations

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from airflow_crypto_etl_spark.queries import has_decimal
from airflow_crypto_etl_spark.session import get_spark
import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = get_spark(app_name="audit-decimal")
    qs = entry.queries()
    bad: list[tuple[str, list[str]]] = []
    err: list[tuple[str, str]] = []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, SF_DIR)
            dec_cols = [f.name for f in df.schema.fields if has_decimal(f.dataType)]
            if dec_cols:
                bad.append((name, dec_cols))
        except Exception as e:  # noqa: BLE001
            err.append((name, repr(e)[:120]))
    for name, cols in bad:
        print(f"DECIMAL {name}: {cols}")
    for name, e in err:
        print(f"ERROR   {name}: {e}")
    print(f"total={len(qs)} decimal_out={len(bad)} errors={len(err)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
