"""Byte-pair-encoding tokenizer TRAINING on the engine.

The reference has no tokenizer surface; this is the training-data
extension that closes the loop opened by ``text.subword_tokens_col``
(which applies a fixed chunking): learn the merge table itself from the
corpus, the way sentencepiece/HF-BPE trainers do, but distributed.

Algorithm (classic BPE, Sennrich et al. 2016 — public):
  1. collapse the corpus to its distinct-word vocabulary with counts
     (the scale move: every later step runs over distinct words,
     not token occurrences);
  2. repeat n_merges times: count adjacent symbol pairs weighted by
     word frequency, take the globally most frequent pair
     (count desc, then lexicographic — a TOTAL order, so training is
     deterministic), and merge that pair greedily left-to-right in
     every word.

Engine mapping: the pair count is one partial-agg groupBy over a
codegen'd sequence+transform explosion; the argmax is a 1-row
TakeOrdered collected to the driver (the merge RULE is driver state by
nature, exactly like k-means centroids); the merge application is a
pure ``F.aggregate`` fold — JVM-side, no UDF — whose left-to-right
greedy semantics match the scan order of a sequential BPE trainer
(verified law: 'aaa' + (a,a) → [aa, a]). Each round localCheckpoints
the vocabulary so lineage stays flat across iterations (the PageRank
pattern). Per-round cost is O(distinct words); rounds are inherently
sequential in BPE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def _persistent_ids(sc) -> set[int]:
    """Ids of currently-persisted RDDs (the JVM registry that owns
    localCheckpoint blocks — DataFrame.unpersist only clears the SQL
    cache manager, never these)."""
    return {int(k) for k in sc._jsc.getPersistentRDDs().keySet()}


def _release_persistent(sc, ids: set[int]) -> None:
    """Unpersist exactly the given RDD ids — the previous round's
    checkpoint blocks — leaving every other cache untouched."""
    jmap = sc._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet()):
        if int(rid) in ids:
            jmap.get(rid).unpersist()


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n, syms) distinct-word vocabulary: counts plus the
    character-symbol array every merge operates on."""
    toks = docs.select(F.explode(tokens_col(text_col)).alias("word"))
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("syms", F.split("word", ""))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair frequencies over the vocabulary, weighted
    by word count — one explode + one partial-agg shuffle."""
    pairs = vocab.where(F.size("syms") >= 2).selectExpr(
        "n",
        "explode(transform(sequence(1, size(syms) - 1),"
        " i -> struct(syms[i-1] AS a, syms[i] AS b))) AS p",
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("n_pairs"))


def merge_pair_col(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of one merge (a,b) to a symbol
    array, as a codegen'd fold (no UDF). Overlap convention matches a
    sequential scanner: 'aaa' under (a,a) → [aa, a]."""

    def step(acc: Column, x: Column) -> Column:
        last = F.element_at(acc, -1)
        hit = (F.size(acc) > 0) & (last == F.lit(a)) & (x == F.lit(b))
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(last, x))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.expr("CAST(array() AS array<string>)"), step)


def train_bpe(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge list and the final merged vocabulary (word, n, syms).

    Driver loop with one tiny collect per round (the 1-row argmax) —
    the merge table IS driver state, as centroids are for k-means; all
    heavy work (pair counts, merge application) stays distributed.
    Stops early when no pair repeats (max count 1 still merges, count
    0 cannot happen on a non-empty vocab with multi-char words)."""
    sc = docs.sparkSession.sparkContext
    before = _persistent_ids(sc)
    vocab = word_vocab(docs, text_col).localCheckpoint(eager=True)
    owned = _persistent_ids(sc) - before
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("n_pairs").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", merge_pair_col(F.col("syms"), a, b))
        # flat lineage per round (the PageRank pattern): without this,
        # round k re-derives k chained folds per evaluation. Release
        # the PREVIOUS round's checkpoint blocks once the new one is
        # materialized — otherwise an n_merges run pins up to n vocab
        # copies in executor storage until driver GC (r5 ADVICE).
        pre = _persistent_ids(sc)
        vocab = vocab.localCheckpoint(eager=True)
        fresh = _persistent_ids(sc) - pre
        _release_persistent(sc, owned)
        owned = fresh
    return merges, vocab


def apply_merges(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize documents with a learned merge list: per-token symbol
    arrays folded through every merge IN TRAINING ORDER (BPE's apply
    rule). Emits one row per document with the token array and counts.
    The merge list is inlined into the plan as literals — the
    'broadcast the model, scan the corpus once' shape."""
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col(text_col)).alias("pos", "word")
    )
    syms = F.split("word", "")
    for a, b in merges:
        syms = merge_pair_col(syms, a, b)
    per_tok = toks.select("doc_id", "pos", "word", syms.alias("pieces"))
    return per_tok.groupBy("doc_id").agg(
        F.sum(F.size("pieces")).alias("n_pieces"),
        F.sum(F.length("word")).alias("n_symbols_before"),
        F.count(F.lit(1)).alias("n_words"),
    )
