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


def test_resize_payload_shape_and_determinism(payloads):
    px = mm.resize_payload(payloads, out_w=4, out_h=4)
    rows = px.limit(50).collect()
    assert rows and all(len(r["pixels"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["pixels"])
    again = {r["doc_id"]: r["pixels"] for r in mm.resize_payload(payloads, 4, 4).limit(50).collect()}
    assert all(again[r["doc_id"]] == r["pixels"] for r in rows)


def test_sample_frames_fanout(payloads):
    frames = mm.sample_frames(payloads, frame_bytes=16, every=4)
    rows = frames.collect()
    assert rows and all(len(r["frame"]) == 16 for r in rows)
    # one doc fans out to multiple ordered frames
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    multi = [v for v in by_doc.values() if len(v) > 1]
    assert multi and all(sorted(v) == list(range(len(v))) for v in by_doc.values())
