"""End-to-end LLM pretraining corpus build: the engine's training-data
operators composed in production order.

This is the integration layer over the operator battery — the plan a
100 TB corpus job actually submits:

    raw documents
      → quality scoring + threshold filter  (operators/text.quality_score)
      → PII redaction                       (operators/llm_prep.scrub_pii)
      → exact dedup on the REDACTED text    (operators/dedup.exact_dedup)
      → deterministic shard shuffle         (operators/llm_prep.shuffle_shards)

Every stage is codegen'd/window/equi-join shaped, so the COMPOSED plan
keeps the per-stage scale properties: the filter and scrub are pure
scans (no shuffle), the dedup shuffles (hash, id) pairs, and the shard
shuffle is one hash exchange with per-shard sorts. Dedup runs AFTER
redaction deliberately: two docs differing only in PII redact to the
same text and must co-dedup (the release-corpus identity).

The whole composition is oracle-checked end-to-end (q_corpus_pipeline
in queries_ext.py) — not just each stage in isolation — so a semantic
drift at a stage boundary (wrong column fed forward, filter applied
after dedup, double-masked text) hash-mismatches.

Provenance: composition of this engine's extension operators; stage
order per standard released-corpus pipelines (C4/Gopher-style filter →
redact → dedup → shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import llm_prep as lp
from ..operators import text as tx


def build_training_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, DataFrame]:
    """Compose the corpus build; returns every stage (lazily — nothing
    executes until a stage is acted on) keyed by name, with ``final``
    carrying (id, shard, pos, n_copies, quality_score) per survivor."""
    scored = tx.quality_score(docs.select(id_col, text_col))
    kept = scored.where(F.col("quality_score") >= F.lit(min_quality))
    scrubbed = lp.scrub_pii(kept, text_col=text_col, out_col="__scrubbed")
    deduped = dd.exact_dedup(
        scrubbed.select(id_col, F.col("__scrubbed").alias(text_col)),
        text_col=text_col,
        id_col=id_col,
    )
    survivors = deduped.select(id_col, "n_copies").join(
        scored.select(id_col, "quality_score"), id_col
    )
    shards = lp.shuffle_shards(survivors, n_shards=n_shards, id_col=id_col)
    final = survivors.join(shards, id_col).select(
        id_col, "shard", "pos", "n_copies", "quality_score"
    )
    return {
        "scored": scored,
        "kept": kept,
        "scrubbed": scrubbed,
        "deduped": deduped,
        "final": final,
    }


def stage_counts(stages: dict[str, DataFrame]) -> dict[str, int]:
    """Row accounting across the pipeline (runs one count job per
    stage) — the numbers a corpus release report publishes."""
    return {name: df.count() for name, df in stages.items()}
