"""Readers for the reference's captured MinIO lake (golden fixtures).

The reference repo ships its MinIO data directory; objects are stored in
MinIO's single-disk `xl.meta` format with the object bytes inlined after
a msgpack header. For the small captured objects, the payload is
recoverable by scanning for the format magic (JSON array / PAR1)."""

from __future__ import annotations

import io
import json

import pyarrow.parquet as pq

LAKE = "/root/reference/minio/data/crypto-lake"


def read_inline_json(xl_meta_path: str) -> list[dict]:
    raw = open(xl_meta_path, "rb").read()
    i, j = raw.find(b"[{"), raw.rfind(b"}]")
    if i < 0 or j < 0:
        raise ValueError(f"no inline JSON payload in {xl_meta_path}")
    return json.loads(raw[i : j + 2])


def read_inline_parquet(xl_meta_path: str):
    raw = open(xl_meta_path, "rb").read()
    a, b = raw.find(b"PAR1"), raw.rfind(b"PAR1")
    if a < 0 or b <= a:
        raise ValueError(f"no inline parquet payload in {xl_meta_path}")
    return pq.read_table(io.BytesIO(raw[a : b + 4]))


def bronze_records(ds: str) -> list[dict]:
    return read_inline_json(f"{LAKE}/bronze/coins/dt={ds}/coin_raw.json/xl.meta")


def silver_table(ds: str):
    return read_inline_parquet(f"{LAKE}/silver/coins/dt={ds}/coin_clean.parquet/xl.meta")


def gold_table(ds: str):
    return read_inline_parquet(f"{LAKE}/gold/coins_daily/dt={ds}/coin_daily_metrics.parquet/xl.meta")
