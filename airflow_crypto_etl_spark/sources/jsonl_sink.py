"""Custom Python DataSource WRITER: sharded JSONL sink with two-phase
commit.

Completes the Spark 4 Python DataSource surface next to the custom
readers (`sources/rest.py` batch, `sources/ticker_stream.py` streaming):
the write path. The reference's closest analogue is the Bronze JSON dump
(`/root/reference/dags/coin_data_pipeline_optimized.py:215-235` —
`json.dumps(records)` pushed to object storage as one opaque blob); this
sink is the distributed re-expression: every task writes its partition
as an independent shard, and publication is atomic via the classic
tmp-write → driver-side rename protocol (the same read-visible atomicity
the reference hand-rolls with its `_tmp_dt=` key dance at `:392-456`).

Semantics:
- task side (``write``): stream rows to ``_tmp/<uuid>.jsonl`` — never a
  final name, so readers can't observe partial output; returns the tmp
  path + row count as the commit message.
- driver side (``commit``): rename every acknowledged shard to its final
  ``part-NNNNN.jsonl`` name and drop a ``_SUCCESS`` marker. Renames are
  metadata-only on a POSIX filesystem; on object stores this step is the
  copy-on-commit the reference performs manually.
- ``abort``: delete tmp shards, leaving the target untouched.

Speculative/retried tasks each write a distinct uuid shard; only the
messages of the tasks Spark acknowledges reach ``commit``, so duplicate
attempts are invisible — exactly-once output without coordination.

Local-mode note: executors and driver share one filesystem here; on a
real cluster the path must be shared storage (NFS / fuse-mounted object
store), or ``commit`` becomes a manifest write against the store's API.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class ShardCommit(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_shard sink requires a 'path' option")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> ShardCommit:
        os.makedirs(os.path.join(self.path, "_tmp"), exist_ok=True)
        tmp = os.path.join(self.path, "_tmp", f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return ShardCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        total = 0
        for i, m in enumerate(messages):
            # keep the task uuid in the final name: a later APPEND job's
            # shard indices restart at 0 and must not clobber these
            shard_id = os.path.basename(m.tmp_path).removesuffix(".jsonl")
            os.replace(
                m.tmp_path,
                os.path.join(self.path, f"part-{i:05d}-{shard_id}.jsonl"),
            )
            total += m.n_rows
        tmp_dir = os.path.join(self.path, "_tmp")
        if os.path.isdir(tmp_dir) and not os.listdir(tmp_dir):
            os.rmdir(tmp_dir)
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as f:
            f.write(json.dumps({"n_rows": total, "n_shards": len(messages)}))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonlShardDataSource(DataSource):
    """``df.write.format("jsonl_shard").option("path", ...).save()`` after
    ``spark.dataSource.register(JsonlShardDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shard"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        return JsonlShardWriter(dict(self.options), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonlShardStreamWriter":
        return JsonlShardStreamWriter(dict(self.options))


class JsonlShardStreamWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`JsonlShardWriter`: every micro-batch
    commits its shards under batch-scoped final names
    (``part-b{batchId}-...``), so a batch retried after a crash re-renames
    over its own names instead of duplicating output — idempotent,
    exactly-once publication keyed by batchId (the same contract
    foreachBatch sinks must implement by hand)."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_shard stream sink requires a 'path' option")
        self.path = path

    def write(self, iterator) -> ShardCommit:
        os.makedirs(os.path.join(self.path, "_tmp"), exist_ok=True)
        tmp = os.path.join(self.path, "_tmp", f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return ShardCommit(tmp_path=tmp, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        # idempotent re-publish: clear any shard this batch already
        # committed (a retry after a crash between rename and checkpoint)
        for name in os.listdir(self.path):
            if name.startswith(f"part-b{batchId:05d}-"):
                os.remove(os.path.join(self.path, name))
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(
                m.tmp_path,
                os.path.join(self.path, f"part-b{batchId:05d}-{i:05d}.jsonl"),
            )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass
