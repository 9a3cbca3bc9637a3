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


def test_split_corpus_stable_and_proportional(spark):
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = lp.split_corpus(docs, {"train": 80, "valid": 10, "test": 10})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["valid"] / 2000 - 0.1) < 0.03
    # membership is a pure function of the id: a subset sees identical splits
    sub = lp.split_corpus(docs.filter("doc_id % 3 = 0"), {"train": 80, "valid": 10, "test": 10})
    full = {r.doc_id: r.split for r in out.collect()}
    assert all(full[r.doc_id] == r.split for r in sub.collect())


def test_split_by_cluster_never_straddles_and_audits_naive_leaks(spark):
    """The cluster-keyed split assigns every member of a cluster the
    SAME split (zero leakage by construction), while naive_leak counts
    exactly the clusters an id-hash split would have torn apart."""
    # 400 clusters of 5 docs each, ids deliberately far apart within a
    # cluster so the naive id-hash disagrees often
    assign = spark.range(0, 2000).selectExpr(
        "id AS doc_id", "id % 400 AS cluster_id"
    )
    out = lp.split_by_cluster(assign, {"train": 80, "valid": 10, "test": 10})
    rows = out.collect()
    assert len(rows) == 2000
    per_cluster: dict[int, set[str]] = {}
    leak_flag: dict[int, bool] = {}
    naive_per_cluster: dict[int, set[str]] = {}
    for r in rows:
        per_cluster.setdefault(r.cluster_id, set()).add(r.split)
        naive_per_cluster.setdefault(r.cluster_id, set()).add(r.naive_split)
        leak_flag[r.cluster_id] = r.naive_leak
    # safe split: one split per cluster, always
    assert all(len(s) == 1 for s in per_cluster.values())
    # audit column == ground truth of the naive assignment
    for cid, naive in naive_per_cluster.items():
        assert leak_flag[cid] == (len(naive) > 1)
    # with 5 far-apart ids per cluster the naive split MUST leak somewhere
    assert any(leak_flag.values())
    # split shares still near the weights (clusters hash uniformly)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 2000 - 0.8) < 0.06
    # stability: a subset of clusters sees identical assignments
    sub = lp.split_by_cluster(
        assign.filter("cluster_id % 3 = 0"), {"train": 80, "valid": 10, "test": 10}
    )
    full = {r.doc_id: r.split for r in rows}
    assert all(full[r.doc_id] == r.split for r in sub.collect())


def test_epoch_upsample_fanout_stability_and_guard(spark):
    """Fan-out = reps per stage exactly; copy shards are a pure
    function of (doc_id, copy) so a subset rerun reproduces them;
    repetition counts >= EPOCH_STRIDE are rejected."""
    import pytest

    staged = spark.range(0, 400).selectExpr("id AS doc_id", "1 + id % 4 AS stage")
    out = lp.epoch_upsample(staged, {1: 1, 2: 2, 3: 3, 4: 4})
    rows = out.collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.epoch_copy, r.shard))
    for r in staged.collect():
        copies = sorted(per_doc[r.doc_id])
        assert [c for c, _ in copies] == list(range(r.stage))
    # stage-0 reps drop rows entirely
    assert lp.epoch_upsample(staged, {1: 0, 2: 0, 3: 0, 4: 1}).count() == 100
    # stability under subsetting
    sub = lp.epoch_upsample(staged.filter("doc_id % 5 = 0"), {1: 1, 2: 2, 3: 3, 4: 4})
    full = {(r.doc_id, r.epoch_copy): r.shard for r in rows}
    assert all(full[(r.doc_id, r.epoch_copy)] == r.shard for r in sub.collect())
    with pytest.raises(ValueError):
        lp.epoch_upsample(staged, {1: lp.EPOCH_STRIDE})


def test_mixture_rebalance_hits_target_and_binds_on_scarcest(spark):
    rows = (
        [(i, "web") for i in range(1000)]
        + [(10_000 + i, "books") for i in range(200)]
        + [(20_000 + i, "code") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = lp.mixture_rebalance(df, {"web": 60, "books": 20, "code": 20})
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # books is scarcest (200/0.2 => total 1000): books keeps ~all, web ~600, code ~200
    assert counts["books"] >= 195
    assert abs(counts["web"] - 600) < 60
    assert abs(counts["code"] - 200) < 40
    # sources absent from the target mixture are dropped entirely
    with_extra = df.union(spark.createDataFrame([(99_999, "junk")], "doc_id long, source string"))
    kept2 = lp.mixture_rebalance(with_extra, {"web": 60, "books": 20, "code": 20})
    assert kept2.filter("source = 'junk'").count() == 0


def test_mixture_rebalance_missing_target_source_binds_at_zero(spark):
    """A target source with zero corpus rows caps the mixture at zero
    (empty result) instead of silently vanishing from the mix."""
    df = spark.createDataFrame(
        [(i, "web") for i in range(100)], "doc_id long, source string"
    )
    kept = lp.mixture_rebalance(df, {"web": 60, "books": 40})
    assert kept.count() == 0


def test_mixture_rebalance_rejects_bad_weights(spark):
    import pytest

    df = spark.createDataFrame([(1, "web")], "doc_id long, source string")
    with pytest.raises(ValueError):
        lp.mixture_rebalance(df, {"web": 0})
    with pytest.raises(ValueError):
        lp.mixture_rebalance(df, {})


def test_chunk_documents_rejects_negative_overlap(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lp.chunk_documents(df, chunk_size=8, overlap=-1)


def test_chunk_documents_covers_text_losslessly(spark):
    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "short doc"), (3, "")], "doc_id long, text string")
    chunks = lp.chunk_documents(df, chunk_size=64, overlap=16)
    rows = sorted(chunks.collect(), key=lambda r: (r.doc_id, r.chunk_id))
    d1 = [r for r in rows if r.doc_id == 1]
    # starts step by 48; 150 tokens -> starts 0,48,96 (the 144 start
    # would be a 6-token pure suffix of chunk 2 — suppressed)
    assert [r.chunk_id for r in d1] == [0, 1, 2]
    assert [r.n_chunk_tokens for r in d1] == [64, 64, 54]
    # stitching non-overlap prefixes (full tail for the last chunk)
    # reconstructs the document exactly
    stride = 48
    rebuilt = []
    for r in d1[:-1]:
        rebuilt.extend(r.chunk_text.split(" ")[:stride])
    rebuilt.extend(d1[-1].chunk_text.split(" "))
    assert rebuilt == text.split(" ")
    # consecutive chunks share exactly the overlap
    assert d1[0].chunk_text.split(" ")[48:] == d1[1].chunk_text.split(" ")[:16]
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_chunk_tokens == 2
    assert not [r for r in rows if r.doc_id == 3]  # empty doc -> no chunks


def test_quantize_embeddings_error_bound_and_range(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0]), (3, [3.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in lp.quantize_embeddings(df).collect()}
    # int8 range respected, extremes hit exactly
    assert out[1].q_min == -127 and -127 <= out[1].q_max <= 127
    assert out[3].q_max == 127 and out[3].q_scale == 3.0 / 127
    # zero vector quantizes to zeros with zero scale
    assert out[2].q_sum == 0 and out[2].q_l1 == 0 and out[2].q_scale == 0.0
    # reconstruction error bound: |x - q*scale| <= scale/2 per dim
    import math
    vec = [0.5, -1.0, 0.25, 0.0]
    scale = out[1].q_scale
    qs = [math.floor(x / scale + 0.5) for x in vec]
    assert all(abs(x - qv * scale) <= scale / 2 + 1e-12 for x, qv in zip(vec, qs))
    assert sum(qs) == out[1].q_sum and sum(abs(v) for v in qs) == out[1].q_l1


def test_shuffle_shards_deterministic_and_complete(spark, sf_dir):
    from airflow_crypto_etl_spark.operators import llm_prep as lp
    from airflow_crypto_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = lp.shuffle_shards(docs, n_shards=16)
    rows = out.collect()
    assert len(rows) == docs.count()
    # positions are a 1..n_shard permutation per shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # rand()-free: identical under a different input partitioning
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in lp.shuffle_shards(docs.repartition(7), n_shards=16).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_length_batches_padding_property(spark, sf_dir):
    """Within a (bucket, stream), batches are length-ordered: every
    batch's max n_tokens <= the next batch's min — so padding to the
    batch max is locally tight; batch_pos stays within batch_size and
    bucket boundaries are respected."""
    from airflow_crypto_etl_spark.operators import llm_prep as lp
    from airflow_crypto_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = lp.length_batches(docs, batch_size=8, n_streams=4).collect()
    groups = {}
    for r in out:
        assert 0 <= r["batch_pos"] < 8
        lo = (0, 64, 128, 256)[r["bucket"]]
        hi = (64, 128, 256, 10**9)[r["bucket"]]
        assert lo <= r["n_tokens"] < hi
        groups.setdefault((r["bucket"], r["stream"], r["batch_seq"]), []).append(r["n_tokens"])
    for (bucket, stream, seq), toks in groups.items():
        nxt = groups.get((bucket, stream, seq + 1))
        if nxt:
            assert max(toks) <= min(nxt)
            assert len(toks) == 8  # only the final batch may be ragged


def test_cms_one_sided_error_and_mergeability(spark, sf_dir):
    """CMS laws: (1) estimate >= true count for EVERY token; (2)
    sketches merge losslessly by cell-wise addition — the sketch of the
    whole corpus equals the merge of two half-corpus sketches."""
    import pyspark.sql.functions as F
    from airflow_crypto_etl_spark.operators import sketch as sk
    from airflow_crypto_etl_spark.operators.text import tokens_col
    from airflow_crypto_etl_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    full = sk.cms_build(toks)
    # one-sided error over the full vocabulary
    truec = toks.groupBy("tok").count()
    est = sk.cms_estimate(full, truec.select("tok"))
    bad = truec.join(est, "tok").where(F.col("cms_est") < F.col("count")).count()
    assert bad == 0
    # lossless merge of disjoint partial sketches
    a = sk.cms_build(toks.where("doc_id % 2 = 0"))
    b = sk.cms_build(toks.where("doc_id % 2 = 1"))
    merged = {(r["j"], r["cell"]): r["c"] for r in sk.cms_merge(a, b).collect()}
    whole = {(r["j"], r["cell"]): r["c"] for r in full.collect()}
    assert merged == whole
