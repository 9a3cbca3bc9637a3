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
    """STUB — media decode (image → pixels etc.). Real implementation
    needs a decoder library on the executors; the Spark-side contract
    (binary in, array out via mapInPandas) is what this function pins."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "media decode requires an image library (e.g. Pillow) on the executors; "
            "not available in this environment — use extract_features (deterministic "
            "byte-level features) for pipeline testing"
        )
    raise NotImplementedError("decoder wiring reserved for an environment with media libs")


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
