"""LLM-prep operators: PII scrubbing, repetition signals, contamination
screening, sequence packing — semantics on crafted corpora (the parity
suite covers engine-vs-oracle exactness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import llm_prep as lp


def test_scrub_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@corp.example.com or 555-0142 thanks"),
            (2, "server 192.168.10.7 rebooted"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lp.scrub_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1 and out[1].n_ipv4 == 0
    assert "<EMAIL>" in out[1].scrubbed and "<PHONE>" in out[1].scrubbed
    assert "jane" not in out[1].scrubbed and "0142" not in out[1].scrubbed
    assert out[2].n_ipv4 == 1 and "<IP>" in out[2].scrubbed and "192.168" not in out[2].scrubbed
    assert out[3].scrubbed == "nothing sensitive here"


def test_repetition_stats_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # pure repetition
            (2, "all words here are distinct"),  # no repetition
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lp.repetition_stats(df).collect()}
    assert out[1].top_token_ratio == 1.0 and out[1].dup_token_ratio == 1.0
    assert out[2].top_token_ratio == 1 / 5 and out[2].dup_token_ratio == 0.0
    assert out[2].mean_token_len == (3 + 5 + 4 + 3 + 8) / 5


def test_contamination_flags_leaked_doc(spark):
    bench = spark.createDataFrame(
        [(1, "the capital of france is paris obviously")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (100, "quiz answer the capital of france is paris obviously end"),  # leaked
            (101, "a completely different document about gardening tips"),
        ],
        "doc_id long, text string",
    )
    hits = lp.contamination(corpus, bench, min_common=2).collect()
    assert [(r.doc_id, r.bench_id) for r in hits] == [(100, 1)]
    assert hits[0].n_common >= 4


def test_pack_sequences_concat_and_chunk(spark):
    """Concat-and-chunk semantics: a doc's bin is where its FIRST token
    lands, so a straddling doc belongs to the bin it starts in (its tail
    is split downstream) — a bin's STARTING docs never begin past the
    capacity boundary."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(40)], "doc_id long, text string"
    )
    out = lp.pack_sequences(docs, capacity=25, n_buckets=4)
    rows = out.collect()
    assert len(rows) == 40 and all(r.n_tokens == 10 for r in rows)
    # every doc's start offset lies inside its assigned bin
    per_bucket = {}
    for r in sorted(rows, key=lambda r: (r.bucket, r.doc_id)):
        start = per_bucket.get(r.bucket, 0)
        per_bucket[r.bucket] = start + r.n_tokens
        assert r.bin_seq == start // 25
    # deterministic across runs
    again = lp.pack_sequences(docs, capacity=25, n_buckets=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pack_sequences_oversized_doc_gets_own_bins(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["w"] * 100))]
        + [(i, " ".join(["w"] * 5)) for i in range(1, 13)],
        "doc_id long, text string",
    )
    rows = lp.pack_sequences(docs, capacity=30, n_buckets=4).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].bin_seq == 0  # oversized doc starts at its bucket's bin 0
    # the first doc AFTER it in the same (hash-assigned) bucket starts
    # past the oversized doc's tokens: bin 100 // 30 = 3
    same = sorted((r for r in rows if r.bucket == by_id[0].bucket and r.doc_id > 0),
                  key=lambda r: r.doc_id)
    assert same, "expected a follower in the oversized doc's bucket"
    assert same[0].bin_seq == 100 // 30
