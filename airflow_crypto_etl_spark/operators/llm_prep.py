"""LLM training-data preparation operators beyond the dedup/ANN/text
batteries: PII scrubbing, Gopher-style repetition filters, benchmark
contamination screening, and context-window sequence packing.

These are the remaining verbs a 100 TB pretraining pipeline runs between
raw crawl and tokenizer, expressed Spark-first:

- everything is built-in-function / window / equi-join shaped (codegen,
  no Python in the hot path);
- the one global-looking step (sequence packing) is bucketed so its
  window state is per-bucket, never a single global partition;
- contamination screening broadcasts the (small) benchmark index, so
  the corpus side never shuffles.

Each operator has a DuckDB-oracle-checkable query in queries_ext.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, no \b differences in play.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
PII_MASKS = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}
# ipv4 must scrub before phone (a dotted quad contains phone-shaped
# digit runs); email before both so usernames with digits survive as a
# single mask.
PII_ORDER = ("email", "ipv4", "phone")


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed") -> DataFrame:
    """Mask emails / phone numbers / IPv4 addresses entirely in
    codegen'd regexp functions — the per-document redaction pass every
    released corpus runs. ``n_<kind>`` counts are per-pattern OCCURRENCE
    counts over the raw text (computed before any masking); when
    patterns overlap (a phone-shaped digit run inside an email local
    part), the earlier pattern in ``PII_ORDER`` wins the mask while both
    occurrences are still counted — counts measure exposure, not which
    mask landed."""
    out = df
    for kind in PII_ORDER:
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS[kind]), F.lit(0)))
        )
    scrubbed = F.col(text_col)
    for kind in PII_ORDER:
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[kind], PII_MASKS[kind])
    return out.withColumn(out_col, scrubbed)


# ---------------------------------------------------------------------------
# Repetition / Gopher-style quality signals
# ---------------------------------------------------------------------------

def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals as exact integer ratios (both
    engines compute sum-then-one-divide, so doubles are IEEE-identical):

    - ``top_token_ratio``: occurrences of the most frequent token / n
      (high → boilerplate);
    - ``dup_token_ratio``: tokens appearing more than once / n;
    - ``mean_token_len``: total token chars / n (degenerate short/long
      tokens signal non-text).
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    # occurrences of each token via the distinct list; max count is the
    # mode frequency. filter+size is an O(n·distinct) fold in codegen —
    # fine for document-sized arrays.
    counts = F.transform(
        F.array_distinct(toks),
        lambda d: F.size(F.filter(toks, lambda t: t == d)),
    )
    top = F.array_max(counts)
    dup_tokens = F.aggregate(
        F.filter(counts, lambda c: c > 1), F.lit(0), lambda a, x: a + x
    )
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return df.withColumns(
        {
            "n_tokens": n,
            "top_token_ratio": F.when(n > 0, top.cast("double") / n).otherwise(0.0),
            "dup_token_ratio": F.when(n > 0, dup_tokens.cast("double") / n).otherwise(0.0),
            "mean_token_len": F.when(n > 0, tok_chars.cast("double") / n).otherwise(0.0),
        }
    )


# ---------------------------------------------------------------------------
# Benchmark contamination screening
# ---------------------------------------------------------------------------

def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_common: int = 2,
) -> DataFrame:
    """Flag corpus documents sharing ≥ ``min_common`` word-n-gram
    shingles with any benchmark document (eval-set leakage screening).

    Scale shape: the benchmark index (distinct shingles of a small eval
    set) is BROADCAST; the corpus explodes shingles map-side and
    equi-joins the broadcast index, then one partial-agg groupBy per
    (corpus doc, benchmark doc). The 100 TB corpus never shuffles its
    text — only matched (doc, bench, shingle) ids move."""
    from .dedup import _doc_shingles

    c_sh = _doc_shingles(corpus, id_col, text_col, n)
    b_sh = _doc_shingles(benchmark, id_col, text_col, n).select(
        F.col(id_col).alias("bench_id"), "shingle"
    )
    hits = (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return hits.select(id_col, "bench_id", "n_common")


# ---------------------------------------------------------------------------
# Context-window sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """Assign documents to context-window bins by CONCAT-AND-CHUNK (the
    standard pretraining packing: concatenate the bucket's token stream
    in doc-id order and split at ``capacity`` boundaries): a doc's bin
    is where its first token lands — ``bin_seq = floor((cumsum -
    n_tokens) / capacity)`` — so a doc may STRADDLE a bin boundary and
    its tail belongs to the next window (the downstream batcher splits
    it there; nothing is silently dropped). This is deliberately NOT
    whole-doc first-fit, which needs a sequential scan that no window
    function expresses.

    Scale shape: a GLOBAL running sum would serialize 100 TB through one
    window partition, so packing is bucketed — docs hash into
    ``n_buckets`` independent streams, each with its own running sum and
    bin sequence (bin identity = (bucket, bin_seq)). Buckets pack in
    parallel and the wasted tail is one partial window per bucket, which
    at corpus scale is noise."""
    from ..functions.hashing import affine_hash

    toks = F.size(tokens_col(text_col))
    w = Window.partitionBy("bucket").orderBy(id_col)
    # bucket on a HASH of the id, not the raw id: block-allocated or
    # strided id spaces (shard bits in the low positions) would collapse
    # pmod(id, n) into few buckets and re-serialize the packing. The
    # affine hash is engine-portable, so the oracle mirrors it exactly.
    binned = (
        docs.select(id_col, toks.alias("n_tokens"))
        .withColumn(
            "bucket", F.pmod(affine_hash(F.col(id_col), F.lit(7)), F.lit(n_buckets)).cast("int")
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_seq",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(capacity)).cast("int"),
        )
    )
    return binned.select(id_col, "n_tokens", "bucket", "bin_seq")
