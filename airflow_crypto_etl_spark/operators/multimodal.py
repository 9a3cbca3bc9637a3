"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns
with a typed metadata struct alongside. The Spark-side machinery that
matters at 100 TB — schema, partition sizing, Arrow batch shape through
``mapInPandas``, and the UDF signatures — is implemented and tested
here for real. The actual media decode is STUBBED (the container ships
no image/audio libraries): ``decode_payload`` raises
``NotImplementedError`` unless a decoder import succeeds, and
``extract_features`` uses a deterministic byte-level fake so the
pipeline shape is exercised end-to-end.

Scale notes: payload columns must never pass through a shuffle that
only needs metadata — project metadata first, join payloads back by id
at the end (``split_payload``). Feature extraction is a mapInPandas
(per-partition Arrow batches), so throughput scales with partition
count and batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`),
not row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # media decoders are not in this environment; gate cleanly
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("head_feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal shape from the documents table: an opaque
    binary payload plus a typed metadata struct (what an image ingest
    would produce; here payload = utf-8 bytes of the text)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def split_payload(df: DataFrame, id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Separate heavy payloads from metadata so downstream shuffles move
    only metadata; rejoin by id after the metadata-side plan."""
    return df.select(id_col, "meta"), df.select(id_col, "payload")


def decode_payload(df: DataFrame) -> DataFrame:
    """General media decode (JPEG/PNG/... → pixels) — needs a decoder
    library on the executors; gated on PIL. For the dependency-free
    format this engine decodes natively, use :func:`decode_ppm`
    (binary P6 — real header/pixel parsing, no libraries)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "JPEG/PNG decode requires an image library (e.g. Pillow) on the "
            "executors; not available in this environment — decode_ppm handles "
            "P6 PPM without dependencies, extract_features gives byte-level "
            "features for any payload"
        )
    raise NotImplementedError("decoder wiring reserved for an environment with media libs")


PPM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("maxval", T.IntegerType()),
        T.StructField("n_px_bytes", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
    ]
)


def make_ppm(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic P6 image: pixel byte i is (doc_id + i) mod 256.
    Ingest-side scaffolding for tests/queries — the decoder below never
    sees these formulas, it parses the binary."""
    n = width * height * 3
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes((doc_id + i) % 256 for i in range(n))


def attach_ppm_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Give every document a decodable P6 payload (width/height derived
    from the id so expected decode output is predictable)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": [
                        make_ppm(int(i), 4 + int(i) % 5, 3 + int(i) % 4) for i in ids
                    ],
                }
            )

    schema = T.StructType(
        [docs.schema[id_col], T.StructField("payload", T.BinaryType())]
    )
    return docs.select(id_col).mapInPandas(batches, schema)


def decode_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL decode, no dependencies: parse the binary P6 header
    (magic, whitespace-separated width/height/maxval per the netpbm
    spec, including comment lines) and the raw pixel buffer, emitting
    typed metadata + the pixel mean. Arrow-batched ``mapInPandas`` —
    the same executor-side batch shape a JPEG decoder would use, so
    swapping the kernel for Pillow changes nothing upstream.

    px_mean is an exact integer sum divided once, so it is
    IEEE-reproducible across engines (oracle-comparable)."""

    def parse_header(b: bytes) -> tuple[int, int, int, int]:
        if b[:2] != b"P6":
            raise ValueError("not a P6 PPM payload")
        vals, pos = [], 2
        while len(vals) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":  # comment runs to end of line
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(b[start:pos]))
        if not (0 < vals[2] < 256):
            # maxval >= 256 means 2-byte samples — a spec-valid P6 this
            # parser does not implement; reject instead of mis-decoding
            raise ValueError(f"unsupported P6 maxval {vals[2]} (1-byte samples only)")
        return vals[0], vals[1], vals[2], pos + 1  # single ws after maxval

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf[id_col], pdf["payload"]):
                w, h, maxval, off = parse_header(bytes(b))
                px = bytes(b)[off : off + w * h * 3]
                if len(px) != w * h * 3:
                    raise ValueError(f"truncated pixel buffer for {id_col}={doc_id}")
                rows.append((doc_id, w, h, maxval, len(px), sum(px) / len(px)))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "maxval", "n_px_bytes", "px_mean"]
            )

    return df.mapInPandas(batches, PPM_SCHEMA)


def extract_features(df: DataFrame, head: int = 8) -> DataFrame:
    """Deterministic per-payload features via Arrow-batched mapInPandas:
    byte count, mean byte value, first-``head`` bytes scaled to [0,1].
    This is the real executor-side batch path a media featurizer uses —
    only the inner math is fake."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "byte_mean": payloads.map(lambda b: sum(b) / len(b) if len(b) else 0.0),
                    "head_feature": payloads.map(
                        lambda b: [x / 255.0 for x in b[:head]] + [0.0] * max(0, head - len(b))
                    ),
                }
            )

    return df.mapInPandas(batches, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
)


def resize_payload(df: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Resize verb (STUB math, real plumbing): treat the payload bytes
    as a row-major grayscale image and nearest-neighbor-sample it to
    (out_w × out_h). A real implementation swaps the inner sampling for
    a decoder+resampler (Pillow/libvips) — the Arrow batch shape,
    output schema, and per-partition streaming are exactly what that
    version uses, so only the kernel changes at deploy time."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n = len(b)
                side = max(int(n ** 0.5), 1)  # fake square geometry
                px = [
                    b[min((y * side // out_h) * side + (x * side // out_w), n - 1)] / 255.0
                    if n
                    else 0.0
                    for y in range(out_h)
                    for x in range(out_w)
                ]
                rows.append((doc_id, out_w, out_h, px))
            yield pd.DataFrame(rows, columns=["doc_id", "out_w", "out_h", "pixels"])

    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 16, every: int = 4) -> DataFrame:
    """Frame-sample verb (video → every k-th frame): the payload is
    treated as a sequence of fixed-size ``frame_bytes`` chunks and every
    ``every``-th chunk is emitted as its own row (one row per sampled
    frame — the fan-out shape a real keyframe extractor produces).
    Deterministic fake chunking; a real codec replaces the splitter."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(b) // frame_bytes
                for i, f in enumerate(range(0, n_frames, every)):
                    rows.append((doc_id, i, bytes(b[f * frame_bytes : (f + 1) * frame_bytes])))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame"])

    return df.mapInPandas(batches, FRAMES_SCHEMA)
