"""Corpus provenance & vocabulary analytics (round 9, batch 2) — the
reporting passes a pretraining-data pipeline runs to UNDERSTAND its
corpus before (and after) the filtering/dedup passes change it:

- cross-source near-duplicate overlap matrix: which sources duplicate
  which (the provenance view of the MinHash pair set — syndication and
  mirror detection, the "should we even crawl both?" question),
- MinHash S-curve calibration: LSH candidate-pair counts by estimated-
  Jaccard bucket, i.e. the measured collision curve the banding scheme
  (K=16, R=4) actually produces on THIS corpus — the knob-tuning view
  for the dedup threshold,
- token coverage curve: cumulative corpus-token share of the top-k
  vocabulary at k ∈ {10, 100, 1000} — the vocabulary-sizing curve of
  tokenizer training (how much of the stream the next 10× of vocab
  actually buys),
- per-source n-gram diversity: type/token ratio and distinct-bigram
  ratio (distinct-2) per source — the standard cheap template/boiler-
  plate detector (a mirror of one template scores near 0),
- per-language tokenizer fertility: subword pieces per whitespace word
  by language — the tokenizer-equity metric (a fertility outlier means
  that language pays more context window per word).

All five are compositions of existing engine primitives (MinHash LSH
pairs, term frequencies, subword tokenization) with one or two extra
partial-aggregable groupBys on bounded key domains (source ≤ 20,
source², jaccard-bucket ≤ 11, lang ≤ 5, k ∈ 3) — nothing here adds a
row-scale shuffle beyond what the underlying primitive already pays.
Exactness rules are the repo's: every mean/ratio is published as ONE
double division of integer-exact operands (MinHash match counts are
round(est*K) bigints — est_jaccard is dyadic, m/16, so the round-trip
is exact), so the oracle hash matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as dd
from .operators import text as tx
from .operators.dedup import MINHASH_K
from .queries import _t
from .queries_ext import _SUBWORD_PIECES, _TOKS, _docs, _minhash_oracle


# ---------------------------------------------------------------------------
# Cross-source near-duplicate overlap matrix
# ---------------------------------------------------------------------------


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source×source near-dup matrix: MinHash LSH pairs (the exact
    q_dedup_minhash pair set) joined to each side's source, pair
    ordered (least, greatest) so the matrix is upper-triangular, then
    counted per source pair with the mean estimated Jaccard.

    Scale shape: the pair set is the already-bounded LSH output (band
    equi-join, never all-pairs); the two source lookups are keyed
    equi-joins against the (doc_id, source) projection; the final
    groupBy keys on source² (bounded domain ≤ 400 cells) with map-side
    partial aggregation. The mean is sum(round(est*K))/(n*K) — integer
    operands, one double division, oracle-exact."""
    docs = _docs(spark, sf_dir)
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
    src = docs.select("doc_id", "source")
    j = pairs.join(
        src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")), "doc_a"
    ).join(
        src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")), "doc_b"
    )
    m = F.round(F.col("est_jaccard") * MINHASH_K).cast("bigint")
    g = (
        j.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            m.alias("m"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("m").cast("bigint").alias("_sm"),
        )
    )
    return g.select(
        "source_a",
        "source_b",
        "n_pairs",
        (F.col("_sm").cast("double") / (F.col("n_pairs") * MINHASH_K)).alias("avg_jaccard"),
    )


ORACLE_SOURCE_OVERLAP = f"""
WITH mp AS MATERIALIZED ({_minhash_oracle(0.5).strip()}),
s AS (SELECT doc_id, source FROM documents),
j AS (
  SELECT least(sa.source, sb.source) AS source_a,
         greatest(sa.source, sb.source) AS source_b,
         CAST(round(est_jaccard * {MINHASH_K}) AS BIGINT) AS m
  FROM mp JOIN s sa ON mp.doc_a = sa.doc_id JOIN s sb ON mp.doc_b = sb.doc_id)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(m) AS DOUBLE) / (CAST(count(*) AS BIGINT) * {MINHASH_K}) AS avg_jaccard
FROM j GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# MinHash S-curve calibration
# ---------------------------------------------------------------------------


def q_minhash_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH collision curve: EVERY candidate pair the banding scheme
    emits (threshold 0.0 — no estimate filter), bucketed by estimated
    Jaccard in tenths (bucket = (m*10) div K over the integer match
    count m; est 1.0 lands in its own bucket 10). The bucket histogram
    IS the measured S-curve of the (K=16, R=4) scheme on this corpus:
    mass below the 0.5 threshold is wasted verification work, mass
    missing above it is recall lost to banding.

    Scale shape: identical to q_dedup_minhash (the band equi-join
    dominates); the extra groupBy keys on an 11-value bounded domain.
    Bucketing is pure integer arithmetic — engine-identical."""
    pairs = dd.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.0)
    m = F.round(F.col("est_jaccard") * MINHASH_K).cast("bigint")
    return (
        pairs.select(m.alias("m"))
        .select(F.expr(f"CAST((m * 10) DIV {MINHASH_K} AS INT)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


ORACLE_MINHASH_CURVE = f"""
WITH mp AS MATERIALIZED ({_minhash_oracle(0.0).strip()})
SELECT CAST((CAST(round(est_jaccard * {MINHASH_K}) AS BIGINT) * 10) // {MINHASH_K} AS INTEGER)
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM mp GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Token coverage curve (vocabulary sizing)
# ---------------------------------------------------------------------------

COVERAGE_KS = (10, 100, 1000)


def token_coverage(docs: DataFrame, ks: tuple[int, ...] = COVERAGE_KS) -> DataFrame:
    """Cumulative token-coverage of the top-k vocabulary at each
    k ∈ ``ks``: for each k, how large a share of ALL token occurrences
    the k most frequent terms account for — the vocabulary-sizing
    curve of tokenizer training.

    Scale shape: one doc-term groupBy and one term groupBy (both
    partial-aggregable — the same two shuffles vocab_topk pays), then
    per-k TakeOrderedAndProject over the CACHED vocab aggregate (ties
    broken by term, so each top-k set is total) feeding a 1-row agg;
    the per-k 1-row results union with the broadcast 1-row corpus
    totals. No global window: the per-k rank never materializes, only
    top-k heaps. Coverage is one double division of bigint operands."""
    tf = tx.term_frequencies(docs)
    vocab = dd.register_cache(tf.groupBy("term").agg(F.sum("tf").alias("n_occ")))
    total = vocab.agg(
        F.sum("n_occ").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
    )
    parts = []
    for k in ks:
        topk = vocab.orderBy(F.col("n_occ").desc(), F.col("term").asc()).limit(k)
        parts.append(
            topk.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_terms"),
                F.sum("n_occ").cast("bigint").alias("cum_tokens"),
            ).select(F.lit(k).cast("int").alias("k"), "n_terms", "cum_tokens")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.crossJoin(F.broadcast(total)).select(
        "k",
        "n_terms",
        "cum_tokens",
        "total_tokens",
        "vocab_size",
        (F.col("cum_tokens").cast("double") / F.col("total_tokens")).alias("coverage"),
    )


def q_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry: the coverage curve at k ∈ {10, 100, 1000}
    over the documents table (see :func:`token_coverage`)."""
    return token_coverage(_docs(spark, sf_dir))


ORACLE_TOKEN_COVERAGE = f"""
WITH vt AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_occ
  FROM (SELECT unnest({_TOKS}) AS term FROM documents) GROUP BY term),
tot AS (SELECT CAST(sum(n_occ) AS BIGINT) AS total_tokens,
               CAST(count(*) AS BIGINT) AS vocab_size FROM vt),
r AS (SELECT *, row_number() OVER (ORDER BY n_occ DESC, term ASC) AS rk FROM vt),
ks AS (SELECT unnest([{", ".join(str(k) for k in COVERAGE_KS)}]) AS k)
SELECT CAST(k AS INTEGER) AS k,
       CAST(count(r.n_occ) AS BIGINT) AS n_terms,
       CAST(sum(r.n_occ) AS BIGINT) AS cum_tokens,
       total_tokens, vocab_size,
       CAST(sum(r.n_occ) AS DOUBLE) / total_tokens AS coverage
FROM ks LEFT JOIN r ON r.rk <= ks.k CROSS JOIN tot
GROUP BY k, total_tokens, vocab_size
"""


# ---------------------------------------------------------------------------
# Per-source n-gram diversity
# ---------------------------------------------------------------------------


def _bigrams_spark_sql(text_col: str = "text") -> str:
    """NON-distinct word bigrams via the slice/zip_with idiom
    (operators.dedup.shingles_sql's shape, minus array_distinct —
    diversity needs occurrence counts, not the distinct set). slice
    with length 0 is empty, so docs with < 2 tokens contribute no
    rows and no descending-sequence hazard exists."""
    toks = f"filter(split({text_col}, ' '), t -> t <> '')"
    m = f"greatest(size({toks}) - 1, 0)"
    return f"zip_with(slice({toks}, 1, {m}), slice({toks}, 2, {m}), (x, y) -> concat(x, ' ', y))"


_BIGRAMS_DUCK = (
    f"list_transform(range(1, greatest(len({_TOKS}) - 1, 0) + 1), "
    f"i -> ({_TOKS})[i] || ' ' || ({_TOKS})[i+1])"
)


def ngram_diversity(docs: DataFrame) -> DataFrame:
    """Per-source corpus diversity: type/token ratio on unigrams and
    distinct-bigram ratio (the distinct-2 metric) — near-zero values
    flag template/boilerplate sources before any pairwise dedup runs.

    Scale shape: two explode → groupBy(source, gram) → groupBy(source)
    legs, all partial-aggregable, joined on the bounded source domain
    (broadcast). Ratios are single double divisions of bigint counts;
    sources whose docs are all single-token publish NULL distinct-2 in
    both engines."""
    uni = docs.select("source", F.explode(tx.tokens_col("text")).alias("g"))
    ua = (
        uni.groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
        )
    )
    bi = docs.select("source", F.explode(F.expr(_bigrams_spark_sql())).alias("g"))
    ba = (
        bi.groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"),
        )
    )
    j = ua.join(F.broadcast(ba), "source", "left")
    return j.select(
        "source",
        "n_tokens",
        "n_types",
        F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
        F.coalesce("n_bigram_types", F.lit(0).cast("bigint")).alias("n_bigram_types"),
        (F.col("n_types").cast("double") / F.col("n_tokens")).alias("ttr"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("n_bigram_types").cast("double") / F.col("n_bigrams"),
        ).alias("distinct2"),
    )


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry: per-source diversity over the documents table
    (see :func:`ngram_diversity`)."""
    return ngram_diversity(_docs(spark, sf_dir))


ORACLE_NGRAM_DIVERSITY = f"""
WITH uni AS (
  SELECT source, unnest({_TOKS}) AS g FROM documents),
ua AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_types
  FROM (SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1, 2)
  GROUP BY source),
bi AS (
  SELECT source, unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
    i -> toks[i] || ' ' || toks[i+1])) AS g
  FROM (SELECT source, {_TOKS} AS toks FROM documents)),
ba AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams, CAST(count(*) AS BIGINT) AS n_bigram_types
  FROM (SELECT source, g, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1, 2)
  GROUP BY source)
SELECT ua.source, n_tokens, n_types,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(n_bigram_types, 0) AS n_bigram_types,
       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
       CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN CAST(n_bigram_types AS DOUBLE) / n_bigrams END AS distinct2
FROM ua LEFT JOIN ba ON ua.source = ba.source
"""


# ---------------------------------------------------------------------------
# Per-language tokenizer fertility
# ---------------------------------------------------------------------------


def q_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: subword pieces per whitespace
    word (corpus-weighted, not doc-averaged — the token-budget view),
    using the engine's BPE-ish subword tokenizer
    (operators.text.subword_tokens_col, the q_subword_count column).
    A language whose fertility is an outlier pays proportionally more
    context window per word — the standard tokenizer-equity check.

    Scale shape: both counts are map-side array-size expressions; the
    only shuffle is the partial-aggregable groupBy on the bounded lang
    domain. Fertility is one double division of bigint sums."""
    docs = _docs(spark, sf_dir)
    g = (
        docs.select(
            "lang",
            F.size(tx.tokens_col("text")).cast("bigint").alias("w"),
            F.size(tx.subword_tokens_col("text")).cast("bigint").alias("p"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("n_words"),
            F.sum("p").cast("bigint").alias("n_pieces"),
        )
    )
    return g.select(
        "lang",
        "n_docs",
        "n_words",
        "n_pieces",
        F.when(
            F.col("n_words") > 0, F.col("n_pieces").cast("double") / F.col("n_words")
        ).alias("fertility"),
    )


ORACLE_FERTILITY = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_TOKS})) AS BIGINT) AS n_words,
       CAST(sum(len({_SUBWORD_PIECES})) AS BIGINT) AS n_pieces,
       CASE WHEN sum(len({_TOKS})) > 0
            THEN CAST(sum(len({_SUBWORD_PIECES})) AS DOUBLE) / CAST(sum(len({_TOKS})) AS BIGINT)
       END AS fertility
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Corpus drift by ingest day (r10, verdict item 4): the "did yesterday's
# crawl change the corpus?" view — the corpus-analytics twin of the
# scalar drift battery (q_jsd / q_psi / q_ks_drift)
# ---------------------------------------------------------------------------

DRIFT_DAYS = 8       # synthetic ingest day = doc_id % 8 (the id-derived
                     # batch convention of q_dedup_incremental)
DRIFT_QBUCKETS = 5   # quality_score in [0,1] -> 5 fixed-width tiers


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ingest-day corpus drift: each day's (source × quality-tier)
    profile against the TRAILING corpus (all prior days), scored with
    Jensen-Shannon divergence — one row per day ≥ 1 with doc counts
    and JSD in nats/bits. In the reference's daily-partitioned
    pipeline this is the per-`dt` report that says whether the newest
    partition shifted the corpus mix; documents carry no date, so the
    ingest day derives from doc_id (the q_dedup_incremental id-slice
    convention).

    Scale shape: ONE corpus-scale pass (the quality scorer, map-only)
    into a partial-agg groupBy keyed on (day × source × tier) — a
    bounded domain (8·20·5 ≤ 800 cells); everything after (the
    day×cell grid, the trailing cumulative window partitioned by cell,
    the per-day JSD collapse) runs on that ≤800-row aggregate. The
    grid product is days × broadcast cell-domain — both bounded.
    JSD uses the q_jsd idiom: only count-ratio proportions reach ln,
    zero-mass cells contribute exact 0.0."""
    from pyspark.sql.window import Window

    from .operators.text import quality_score

    docs = _docs(spark, sf_dir)
    scored = quality_score(docs).select(
        (F.col("doc_id") % DRIFT_DAYS).alias("dt"),
        "source",
        F.least(
            F.floor(F.col("quality_score") * DRIFT_QBUCKETS),
            F.lit(DRIFT_QBUCKETS - 1),
        ).cast("int").alias("qb"),
    )
    day_cells = scored.groupBy("dt", "source", "qb").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    days = day_cells.select("dt").distinct()
    dom = day_cells.select("source", "qb").distinct()
    grid = days.join(F.broadcast(dom), F.lit(True))
    g = grid.join(day_cells, ["dt", "source", "qb"], "left").na.fill({"cnt": 0})
    w_trail = (
        Window.partitionBy("source", "qb")
        .orderBy("dt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("trail", F.coalesce(F.sum("cnt").over(w_trail), F.lit(0)))
    w_day = Window.partitionBy("dt")
    n_day = F.sum("cnt").over(w_day).cast("double")
    n_tr = F.sum("trail").over(w_day).cast("double")
    p = F.col("cnt").cast("double") / n_day
    q = F.col("trail").cast("double") / n_tr
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(p > 0, p * F.log(p)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q)).otherwise(F.lit(0.0))
    ) / F.lit(2.0) - F.when(m > 0, m * F.log(m)).otherwise(F.lit(0.0))
    per = g.select(
        "dt", "cnt", "trail",
        n_day.alias("n_day"), n_tr.alias("n_tr"), term.alias("contrib"),
    ).filter(F.col("n_tr") > 0)
    return per.groupBy("dt").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.sum("trail").cast("bigint").alias("n_trailing"),
        F.sum("contrib").alias("jsd_nats"),
        (F.sum("contrib") / F.log(F.lit(2.0))).alias("jsd_bits"),
    )


def _corpus_drift_oracle() -> str:
    from .queries_analytics import _quality_sql

    p = "CAST(cnt AS DOUBLE) / n_day"
    q = "CAST(trail AS DOUBLE) / n_tr"
    m = f"(({p}) + ({q})) / CAST(2.0 AS DOUBLE)"
    term = (
        f"(CASE WHEN {p} > 0 THEN ({p}) * ln({p}) ELSE CAST(0.0 AS DOUBLE) END"
        f" + CASE WHEN {q} > 0 THEN ({q}) * ln({q}) ELSE CAST(0.0 AS DOUBLE) END)"
        f" / CAST(2.0 AS DOUBLE)"
        f" - CASE WHEN {m} > 0 THEN ({m}) * ln({m}) ELSE CAST(0.0 AS DOUBLE) END"
    )
    return f"""
WITH scored AS ({_quality_sql('documents')}),
base AS (
  SELECT s.doc_id % {DRIFT_DAYS} AS dt, d.source,
         CAST(least(floor(s.quality_score * {DRIFT_QBUCKETS}), {DRIFT_QBUCKETS - 1})
              AS INTEGER) AS qb
  FROM scored s JOIN documents d USING (doc_id)),
day_cells AS (
  SELECT dt, source, qb, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2, 3),
days AS (SELECT DISTINCT dt FROM day_cells),
dom AS (SELECT DISTINCT source, qb FROM day_cells),
grid AS (SELECT days.dt, dom.source, dom.qb FROM days CROSS JOIN dom),
g AS (
  SELECT grid.dt, grid.source, grid.qb, COALESCE(cnt, 0) AS cnt
  FROM grid LEFT JOIN day_cells USING (dt, source, qb)),
t AS (
  SELECT *, COALESCE(sum(cnt) OVER (PARTITION BY source, qb ORDER BY dt
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS trail
  FROM g),
per AS (
  SELECT dt, cnt, trail,
         CAST(sum(cnt) OVER (PARTITION BY dt) AS DOUBLE) AS n_day,
         CAST(sum(trail) OVER (PARTITION BY dt) AS DOUBLE) AS n_tr
  FROM t),
c AS (SELECT dt, cnt, trail, {term} AS contrib FROM per WHERE n_tr > 0)
SELECT dt, CAST(sum(cnt) AS BIGINT) AS n_docs,
       CAST(sum(trail) AS BIGINT) AS n_trailing,
       sum(contrib) AS jsd_nats,
       sum(contrib) / ln(CAST(2.0 AS DOUBLE)) AS jsd_bits
FROM c GROUP BY dt
"""


ORACLE_CORPUS_DRIFT = _corpus_drift_oracle()


QUERIES_CORPUS = {
    "q_corpus_drift": q_corpus_drift,
    "q_source_overlap": q_source_overlap,
    "q_minhash_curve": q_minhash_curve,
    "q_token_coverage": q_token_coverage,
    "q_ngram_diversity": q_ngram_diversity,
    "q_fertility": q_fertility,
}

ORACLE_CORPUS = {
    "q_corpus_drift": ORACLE_CORPUS_DRIFT,
    "q_source_overlap": ORACLE_SOURCE_OVERLAP,
    "q_minhash_curve": ORACLE_MINHASH_CURVE,
    "q_token_coverage": ORACLE_TOKEN_COVERAGE,
    "q_ngram_diversity": ORACLE_NGRAM_DIVERSITY,
    "q_fertility": ORACLE_FERTILITY,
}
