"""Scheduled ANN-index maintenance: the health → decision → action
loop as ONE runnable job, composing the operator-level lifecycle
(`operators/similarity`: ivf_index_build / append / compact / stats /
retrain) the way the reference composes its daily tasks into a DAG
(`/root/reference/dags/coin_data_pipeline_optimized.py` — provenance:
engine extension; the reference has no index surface, but its
"scheduled maintenance task + idempotent re-run" contract is the model
for this module).

Versioned publish protocol
--------------------------
A persisted index lives under one root::

    root/_CURRENT          <- text file holding the live epoch number
    root/v0/centroids/     <- parquet (cid, cv, cn)
    root/v0/assign/        <- parquet (cid, vec_id), batch_id= appends
    root/v1/...            <- published by a maintenance action

Readers resolve ``_CURRENT`` → ``v{n}`` once per job; writers build
the next ``v{n+1}`` completely and move the pointer LAST (atomic
rename locally; on an object store the single-key pointer PUT is the
atomic step). Retraining re-keys every inverted list and compaction
rewrites the base layout, so in-place mutation of a live version is
never correct — the pointer swap is what lets a year-long reader
lineage finish against the version it started on. A maintenance run
that dies half-way leaves a dangling ``v{n+1}`` directory and the
pointer untouched: the next run overwrites it — re-runs are
idempotent at the version grain, the reference's "clear failed task
and re-run" contract.

Decision rule (both thresholds data-relative, read from ONE bounded
``ivf_index_stats`` row):

- ``spread > retrain_spread`` or any list over ``list_cap`` →
  **retrain** (`ivf_index_retrain`: the quantizer no longer fits the
  grown corpus; publishes new centroids AND assignment, append epoch
  resets);
- else ``n_append_batches >= compact_after_batches`` → **compact**
  (`ivf_index_compact`: small-file buildup; same quantizer, re-laid
  assignment, append epoch resets);
- else **noop** (the stats row is still returned for monitoring —
  the q_ann_index_health signal, scheduled).

At 100 TB the cycle's cost is exactly its action's cost: the stats
read is one partial-agg over (cid, id) index rows, compaction one
index-row shuffle, retraining two corpus-scale broadcast-product
passes (the FAISS retrain contract) — and the noop path touches only
the index tables, never the vectors.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as sim
from ..session import apply_runtime_confs

_POINTER = "_CURRENT"


def current_epoch(root: str) -> int:
    """Read the live epoch from the pointer file (-1 = never
    published)."""
    p = os.path.join(root, _POINTER)
    if not os.path.exists(p):
        return -1
    with open(p, "r", encoding="ascii") as f:
        return int(f.read().strip())


def index_paths(root: str, epoch: int) -> tuple[str, str]:
    v = os.path.join(root, f"v{epoch}")
    return os.path.join(v, "centroids"), os.path.join(v, "assign")


def publish_index(
    root: str, centroids: DataFrame, assign: DataFrame, epoch: int
) -> tuple[str, str]:
    """Write a complete ``v{epoch}`` pair, then move the pointer LAST
    (write-temp + atomic rename — the object-store single-key-PUT
    analogue). The assign side is written ``batch_id=``-partitioned
    with the epoch's rows as batch 0, so subsequent appends land as
    further partitions of the SAME version directory."""
    cents_p, assign_p = index_paths(root, epoch)
    centroids.write.mode("overwrite").parquet(cents_p)
    rows = assign if "batch_id" in assign.columns else assign.withColumn(
        "batch_id", F.lit(0)
    )
    (
        rows.write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(assign_p)
    )
    tmp = os.path.join(root, _POINTER + ".tmp")
    with open(tmp, "w", encoding="ascii") as f:
        f.write(str(epoch))
    os.replace(tmp, os.path.join(root, _POINTER))
    return cents_p, assign_p


def bootstrap_index(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    n_centroids: int = 16,
    list_cap: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spread: bool = True,
) -> int:
    """First publish: build the seeded pair over the corpus and
    publish it as epoch 0 (idempotent — re-running overwrites v0 and
    re-points)."""
    apply_runtime_confs(spark)
    cents, assign = sim.ivf_index_build(
        corpus, n_centroids=n_centroids, list_cap=list_cap,
        id_col=id_col, vec_col=vec_col, spread=spread,
    )
    publish_index(root, cents, assign, 0)
    return 0


def append_batch(
    spark: SparkSession,
    batch: DataFrame,
    root: str,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spread: bool = True,
) -> int:
    """The daily ingest half: assign ONLY the batch against the LIVE
    version's stored quantizer and append it as that version's
    ``batch_id=`` partition (dynamic overwrite — a replayed batch_id
    is a no-op). Returns the epoch appended to."""
    apply_runtime_confs(spark)
    epoch = current_epoch(root)
    cents_p, assign_p = index_paths(root, epoch)
    rows = sim.ivf_index_append(
        batch, spark.read.parquet(cents_p), id_col=id_col, vec_col=vec_col,
        spread=spread,
    )
    (
        rows.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(assign_p)
    )
    return epoch


def maintenance_cycle(
    spark: SparkSession,
    corpus: DataFrame,
    root: str,
    n_centroids: int = 16,
    list_cap: int | None = None,
    compact_after_batches: int = 8,
    retrain_spread: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spread: bool = True,
) -> dict:
    """One scheduled maintenance pass: read the health row, decide,
    act, publish. Returns ``{"action", "epoch", "stats"}`` — the
    monitoring record (the q_ann_index_health signal plus what was
    done about it). ``corpus`` is the index's source-of-truth vector
    table; only the retrain action reads it."""
    apply_runtime_confs(spark)
    epoch = current_epoch(root)
    _, assign_p = index_paths(root, epoch)
    grown = spark.read.parquet(assign_p)
    stats = sim.ivf_index_stats(grown, list_cap=list_cap, id_col=id_col).collect()[0]
    if stats["spread"] > retrain_spread or stats["n_lists_over_cap"] > 0:
        cents2, assign2 = sim.ivf_index_retrain(
            corpus, n_centroids=n_centroids, list_cap=list_cap,
            id_col=id_col, vec_col=vec_col, spread=spread,
        )
        publish_index(root, cents2, assign2, epoch + 1)
        action = "retrain"
    elif stats["n_append_batches"] >= compact_after_batches:
        cents_p, _ = index_paths(root, epoch)
        compacted = sim.ivf_index_compact(grown, id_col=id_col)
        publish_index(root, spark.read.parquet(cents_p), compacted, epoch + 1)
        action = "compact"
    else:
        action = "noop"
    return {"action": action, "epoch": current_epoch(root), "stats": stats.asDict()}


def lookup(
    spark: SparkSession,
    batch: DataFrame,
    corpus: DataFrame,
    root: str,
    k: int = 10,
    n_probe: int = 4,
    list_cap: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spread: bool = True,
) -> DataFrame:
    """Search a batch against the LIVE version (pointer resolved once;
    the returned plan keeps reading that version even if a maintenance
    cycle publishes a newer one mid-flight — the reason the protocol
    never mutates a published version in place)."""
    apply_runtime_confs(spark)
    cents_p, assign_p = index_paths(root, current_epoch(root))
    assign = spark.read.parquet(assign_p).select("cid", id_col)
    if list_cap is not None:
        assign = sim.ivf_index_cap(assign, list_cap)
    return sim.ivf_index_lookup(
        batch, corpus, spark.read.parquet(cents_p), assign,
        k=k, n_probe=n_probe, id_col=id_col, vec_col=vec_col, spread=spread,
    )
