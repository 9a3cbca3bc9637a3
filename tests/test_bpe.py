"""BPE trainer laws: the distributed trainer must reproduce a
sequential reference implementation EXACTLY (same merge table, same
final segmentations), and tokenization must be lossless."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import bpe
from airflow_crypto_etl_spark.queries import _t


@pytest.fixture(autouse=True)
def _unpersist_checkpoints(spark):
    """train_bpe localCheckpoints its vocabulary each round (flat
    lineage); those persisted RDDs would otherwise linger past this
    module and trip the cache-hygiene assertion in
    test_dedup_pruning (alphabetically later)."""
    yield
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet()):
        jmap.get(rid).unpersist()


def _ref_bpe(texts: list[str], k: int):
    """Pure-python sequential BPE (greedy left-to-right merges; ties
    broken count desc then pair asc, mirroring the engine)."""
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        for w, n in vocab.items():
            s = words[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, s in words.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            words[w] = out
    return merges, words


def test_train_bpe_matches_sequential_reference(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_words = _ref_bpe(texts, 6)
    merges, vocab = bpe.train_bpe(docs, n_merges=6)
    assert merges == want_merges
    got_words = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got_words == {w: s for w, s in want_words.items()}


def test_apply_merges_is_lossless_and_consistent(spark, sf_dir):
    """Reconstruction law: concatenating a word's pieces yields the
    word, for every word, after applying a learned merge list."""
    docs = _t(spark, sf_dir, "documents")
    merges, _ = bpe.train_bpe(docs, n_merges=4)
    toks = docs.select(F.explode(bpe.tokens_col("text")).alias("word")).distinct()
    syms = F.split("word", "")
    for a, b in merges:
        syms = bpe.merge_pair_col(syms, a, b)
    bad = toks.select("word", F.array_join(syms, "").alias("rejoined")).where(
        F.col("word") != F.col("rejoined")
    )
    assert bad.count() == 0
    # piece counts shrink monotonically with more merges
    agg0 = bpe.apply_merges(docs, [])
    agg4 = bpe.apply_merges(docs, merges)
    j = agg0.select("doc_id", F.col("n_pieces").alias("p0")).join(
        agg4.select("doc_id", "n_pieces"), "doc_id"
    )
    assert j.where(F.col("n_pieces") > F.col("p0")).count() == 0
    # with zero merges, pieces == raw symbols
    assert agg0.where(F.col("n_pieces") != F.col("n_symbols_before")).count() == 0
