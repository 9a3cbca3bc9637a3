"""Multimodal binary plumbing: schema, payload/metadata split, and the
Arrow-batched mapInPandas feature path (decode itself is stubbed)."""

from __future__ import annotations

import pytest

from airflow_crypto_etl_spark.operators import multimodal as mm
from airflow_crypto_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return mm.attach_payload(load_table(spark, sf_dir, "documents"))


def test_payload_schema(payloads):
    types = {f.name: f.dataType.simpleString() for f in payloads.schema.fields}
    assert types["payload"] == "binary"
    assert types["meta"].startswith("struct<mime:string,n_bytes:bigint")


def test_split_payload_keeps_metadata_narrow(payloads):
    meta, heavy = mm.split_payload(payloads)
    assert set(meta.columns) == {"doc_id", "meta"}
    assert set(heavy.columns) == {"doc_id", "payload"}


def test_extract_features_mapinpandas(spark, sf_dir, payloads):
    feats = mm.extract_features(payloads)
    rows = {r["doc_id"]: r for r in feats.collect()}
    docs = {r["doc_id"]: r for r in load_table(spark, sf_dir, "documents").collect()}
    assert len(rows) == len(docs)
    some = next(iter(docs))
    assert rows[some]["n_bytes"] == len(docs[some]["text"].encode())
    assert len(rows[some]["head_feature"]) == 8
    assert 0.0 <= rows[some]["byte_mean"] <= 255.0


def test_decode_is_stubbed(payloads):
    with pytest.raises(NotImplementedError, match="media decode"):
        mm.decode_payload(payloads)
