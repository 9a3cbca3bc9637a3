"""Stop-shingle pruning: a ubiquitous shingle must not create a
quadratic join bucket, and Jaccard is computed over the pruned space."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import dedup as dd


def _corpus(spark):
    # every doc shares the ubiquitous phrase; docs 1/2 are near-dups in
    # the rest of their text, doc 3 is unrelated
    common = "the quick brown fox"
    rows = [
        (1, f"{common} alpha beta gamma delta epsilon"),
        (2, f"{common} alpha beta gamma delta zeta"),
        (3, f"{common} one two three four five"),
    ] + [
        # filler docs so df_frac=0.5 prunes only the ubiquitous phrase
        # (in all docs), not the 1/2-distinctive shingles (df=2)
        (10 + i, f"{common} filler{i}a filler{i}b filler{i}c filler{i}d")
        for i in range(7)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ubiquitous_shingle_pruned_bounds_buckets(spark):
    docs = _corpus(spark)
    sh = dd._doc_shingles(docs, "doc_id", "text", 3)
    # unpruned: the shared-phrase shingles appear in every doc
    top_raw = sh.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    assert top_raw == 10
    pruned = dd.ngram_jaccard_pairs(docs, threshold=0.0, df_frac=0.5)
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in pruned.collect()}
    # docs 1,2 still found as near-dups on their distinctive shingles
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.3
    # doc 3 shares ONLY the pruned ubiquitous shingles -> no pair at all
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_df_cap_absolute(spark):
    docs = _corpus(spark)
    # cap=1 removes every shingle appearing in >1 doc -> no common left
    out = dd.ngram_jaccard_pairs(docs, threshold=0.0, df_cap=1)
    assert out.count() == 0


def test_unpruned_path_unchanged(spark):
    docs = _corpus(spark)
    out = dd.ngram_jaccard_pairs(docs, threshold=0.0)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    # ubiquitous shingles link every doc pair when pruning is off
    assert {(1, 2), (1, 3), (2, 3), (1, 10), (10, 11)} <= pairs


def test_minhash_lookup_incremental(spark):
    """Incremental dedup: a batch matches against the corpus INDEX
    (sig+bands), finding known duplicates without re-deduping the
    corpus; a novel doc matches nothing."""
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(i, f"totally unique document number {i} about topic {i} with many words "
             f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}") for i in range(20)],
        "doc_id long, text string",
    )
    sig = dd.minhash_signatures(corpus)
    bands = dd.minhash_bands(sig)
    batch = corpus.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    ).unionByName(
        spark.createDataFrame(
            [(999, "a completely novel text sharing no shingles at all "
                   "qq ww ee rr tt yy uu ii oo pp")],
            "doc_id long, text string",
        )
    )
    hits = dd.minhash_lookup(batch, sig, bands, threshold=0.5).collect()
    got = {(r.new_id, r.corpus_id): r.est_jaccard for r in hits}
    assert {(100, 0), (101, 1), (102, 2)} <= set(got)
    assert all(got[(100 + i, i)] == 1.0 for i in range(3))  # exact copies
    assert not any(n == 999 for n, _ in got)  # novel doc matches nothing


def test_release_caches_leaves_no_persistent_rdds(spark, sf_dir):
    """Round-3 verdict #3: the session-scoped dedup caches must be
    reclaimable — after consuming each dedup query and calling
    release_caches, no cached RDD may remain pinned."""
    from airflow_crypto_etl_spark import queries_ext as qx
    from airflow_crypto_etl_spark import queries_pipeline as qp

    for q in (qx.q_dedup_minhash, qx.q_dedup_incremental, qp.q_dedup_passage):
        q(spark, sf_dir).count()
    assert dd.release_caches() >= 3
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() == 0


def test_duplicate_clusters_unpersists_edges(spark):
    """After the propagation loop the edge cache is released in-function;
    with the signature cache released too, the DataFrame cache manager
    must be empty. (getPersistentRDDs is not the right probe here: the
    result's localCheckpoint blocks legitimately remain until the
    ContextCleaner reaps them — those are not cacheManager entries.)"""
    docs = _corpus(spark)
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.3)
    out = dd.duplicate_clusters(docs, pairs)
    n = out.count()
    assert n == docs.count()
    dd.release_caches()  # the lsh signature cache
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_simhash_chunked_matches_allpairs_and_bucket_joins(spark):
    """Manku chunk join (round-3 verdict #7): identical pairs to the
    all-pairs XOR kernel, via an equi-join plan (no nested-loop join)."""
    docs = _corpus(spark)
    ap = {tuple(r) for r in dd.simhash_pairs(docs, max_hamming=6).collect()}
    ch_df = dd.simhash_pairs_chunked(docs, max_hamming=6)
    ch = {tuple(r) for r in ch_df.collect()}
    assert ap == ch
    plan = ch_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_registered_path_pins_absolute_cap(spark):
    """r4 verdict item 4: the REGISTERED q_dedup_ngram must carry an
    absolute df_cap — df_frac alone leaves hot-shingle buckets unbounded
    as the corpus grows. Build a hot-shingle corpus larger than the cap
    and assert no surviving shingle's bucket exceeds it."""
    import inspect

    from airflow_crypto_etl_spark import queries_ext as qx

    src = inspect.getsource(qx.q_dedup_ngram)
    assert "df_cap" in src and qx.NGRAM_DF_CAP >= 1

    cap = 5
    hot = "alpha beta gamma delta"  # one shingle set shared by ALL docs
    docs = spark.createDataFrame(
        [(i, f"{hot} tail{i}x tail{i}y tail{i}z") for i in range(20)],
        "doc_id long, text string",
    )
    sh = dd._doc_shingles(docs, "doc_id", "text", 3)
    dfreq = sh.groupBy("shingle").count()
    assert dfreq.agg(F.max("count")).collect()[0][0] == 20  # hot indeed
    # replicate the operator's pruning with the absolute cap
    survivors = sh.join(dfreq.filter(F.col("count") <= cap).select("shingle"), "shingle")
    max_bucket = (
        survivors.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket is not None and max_bucket <= cap
    # and the operator itself under the cap still yields zero pairs here
    # (every doc's tail shingles are unique, the hot shingles are pruned)
    assert dd.ngram_jaccard_pairs(docs, threshold=0.0, df_cap=cap).count() == 0


def test_minhash_index_append_equals_rebuild(spark, tmp_path):
    """The growing MinHash index (r11): base index persisted, two
    batches appended batch_id-partitioned (one replayed — a no-op),
    and a lookup through base + appended rows equals a lookup through
    an index rebuilt over the union corpus."""
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(i, f"totally unique document number {i} about topic {i} with many words "
             f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}") for i in range(30)],
        "doc_id long, text string",
    )
    base = corpus.filter(F.col("doc_id") < 20)

    def put(kind, rows, b):
        (rows.withColumn("batch_id", F.lit(b))
         .write.mode("overwrite").partitionBy("batch_id")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(str(tmp_path / kind)))

    sig0 = dd.minhash_signatures(base)
    put("sig", sig0, 0)
    put("bands", dd.minhash_bands(sig0), 0)
    b1 = corpus.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 25))
    b2 = corpus.filter(F.col("doc_id") >= 25)
    for b, batch in ((1, b1), (2, b2), (1, b1)):  # third write replays b1
        s, bd = dd.minhash_index_append(batch)
        put("sig", s, b)
        put("bands", bd, b)
    sig_p = spark.read.parquet(str(tmp_path / "sig")).select("doc_id", "i", "mh")
    bands_p = spark.read.parquet(str(tmp_path / "bands")).select(
        "doc_id", "band", "band_sig"
    )
    # copies of docs 18 and 27: one matches a base-indexed doc, one an
    # APPENDED doc — the lookup must see both through the grown index
    batch = corpus.filter(F.col("doc_id").isin([18, 27])).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["est_jaccard"]
        for r in dd.minhash_lookup(batch, sig_p, bands_p, threshold=0.5).collect()
    }
    full_sig = dd.minhash_signatures(corpus)
    want = {
        (r["new_id"], r["corpus_id"]): r["est_jaccard"]
        for r in dd.minhash_lookup(
            batch, full_sig, dd.minhash_bands(full_sig), threshold=0.5
        ).collect()
    }
    assert got == want
    assert {(118, 18), (127, 27)} <= set(got)
    assert got[(118, 18)] == 1.0 and got[(127, 27)] == 1.0
    # replay added no duplicate signature rows
    assert sig_p.count() == full_sig.count()


def _index_corpus(spark):
    return spark.createDataFrame(
        [(i, f"totally unique document number {i} about topic {i} with many words "
             f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}") for i in range(30)],
        "doc_id long, text string",
    )


def test_minhash_index_compact_is_pure_relayout(spark, tmp_path):
    """minhash_index_compact consumes batch_id and preserves the exact
    row multisets of both grown index tables, and lookup against the
    compacted pair is row-identical to lookup against the grown one —
    compaction is pure re-layout (the small-file maintenance half of
    the dedup append contract, the twin of ivf_index_compact)."""
    corpus = _index_corpus(spark)
    base = corpus.filter(F.col("doc_id") < 20)

    def put(kind, rows, b):
        (rows.withColumn("batch_id", F.lit(b))
         .write.mode("overwrite").partitionBy("batch_id")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(str(tmp_path / kind)))

    sig0 = dd.minhash_signatures(base)
    put("sig", sig0, 0)
    put("bands", dd.minhash_bands(sig0), 0)
    for b, lo, hi in ((1, 20, 25), (2, 25, 30)):
        s, bd = dd.minhash_index_append(
            corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
        put("sig", s, b)
        put("bands", bd, b)
    grown_sig = spark.read.parquet(str(tmp_path / "sig"))
    grown_bands = spark.read.parquet(str(tmp_path / "bands"))
    sig_c, bands_c = dd.minhash_index_compact(grown_sig, grown_bands)
    sig_c.write.parquet(str(tmp_path / "sig_c"))
    bands_c.write.parquet(str(tmp_path / "bands_c"))
    sig_p = spark.read.parquet(str(tmp_path / "sig_c"))
    bands_p = spark.read.parquet(str(tmp_path / "bands_c"))
    assert set(sig_p.columns) == {"doc_id", "i", "mh"}
    assert set(bands_p.columns) == {"doc_id", "band", "band_sig"}
    assert sorted((r["doc_id"], r["i"], r["mh"]) for r in sig_p.collect()) == sorted(
        (r["doc_id"], r["i"], r["mh"]) for r in grown_sig.collect()
    )
    assert sorted(
        (r["doc_id"], r["band"], r["band_sig"]) for r in bands_p.collect()
    ) == sorted((r["doc_id"], r["band"], r["band_sig"]) for r in grown_bands.collect())
    batch = corpus.filter(F.col("doc_id").isin([18, 27])).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    key = lambda r: (r["new_id"], r["corpus_id"])  # noqa: E731
    via_grown = sorted(
        dd.minhash_lookup(
            batch,
            grown_sig.select("doc_id", "i", "mh"),
            grown_bands.select("doc_id", "band", "band_sig"),
            threshold=0.5,
        ).collect(),
        key=key,
    )
    via_comp = sorted(
        dd.minhash_lookup(batch, sig_p, bands_p, threshold=0.5).collect(), key=key
    )
    assert [tuple(r) for r in via_grown] == [tuple(r) for r in via_comp]
    assert {(118, 18), (127, 27)} <= {(r["new_id"], r["corpus_id"]) for r in via_comp}


def test_minhash_index_stats_arithmetic(spark):
    """minhash_index_stats recomputes exactly against a Python
    reference over the collected bands: bucket totals, max occupancy,
    spread, the >2x-mean hot-bucket count, and the batch_id append
    bookkeeping; a table WITHOUT batch_id reports zero bookkeeping."""
    import math
    from collections import Counter

    corpus = _index_corpus(spark)
    base = corpus.filter(F.col("doc_id") < 20)
    grown = dd.minhash_bands(dd.minhash_signatures(base)).withColumn(
        "batch_id", F.lit(0)
    )
    for b, lo, hi in ((1, 20, 25), (2, 25, 30)):
        _, bd = dd.minhash_index_append(
            corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
        grown = grown.unionByName(bd.withColumn("batch_id", F.lit(b)))
    row = dd.minhash_index_stats(grown).collect()[0]
    bands = [(r["band"], r["band_sig"], r["batch_id"]) for r in grown.collect()]
    sizes = Counter((b, s) for b, s, _ in bands)
    n_rows = len(bands)
    n_buckets = len(sizes)
    max_occ = max(sizes.values())
    mean = n_rows / n_buckets
    assert row["n_buckets"] == n_buckets
    assert row["n_rows"] == n_rows
    assert row["n_docs"] == n_rows // dd.MINHASH_B == 30
    assert row["max_occ"] == max_occ
    assert math.isclose(row["spread"], max_occ * n_buckets / n_rows, rel_tol=1e-12)
    assert row["n_hot_buckets"] == sum(1 for v in sizes.values() if v > 2.0 * mean)
    assert row["n_append_batches"] == 2
    assert row["appended_rows"] == sum(1 for _, _, bid in bands if bid != 0)
    assert math.isclose(
        row["appended_frac"], row["appended_rows"] / n_rows, rel_tol=1e-12
    )
    bare = dd.minhash_index_stats(grown.drop("batch_id")).collect()[0]
    assert bare["n_append_batches"] == 0 and bare["appended_rows"] == 0
    assert (bare["n_buckets"], bare["n_rows"], bare["max_occ"]) == (
        row["n_buckets"], row["n_rows"], row["max_occ"]
    )
