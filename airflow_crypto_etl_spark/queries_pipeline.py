"""Round-4 pipeline-query registry: passage-level dedup, CDC apply,
deterministic sampling, corpus vocabulary / TF-IDF, and Z-order layout
stats — the data-management operators that sit AROUND the core engine
in a production training-data pipeline (snapshot maintenance, auditable
sampling, keyword extraction, scan-pruning layout).

Every oracle is built from the same deterministic integer / rational-
double arithmetic as the Spark implementation (functions.hashing
docstring has the portability rules), so values are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import GRAM_MOD, char_hash_sql
from .operators import cdc
from .operators import dedup as dd
from .operators import layout as lo
from .operators import sampling as sp
from .operators import text as tx
from .queries import _t
from .queries_ext import _DUP_CORPUS_SQL, _TOKS, _docs, _dup_corpus

# ---------------------------------------------------------------------------
# Passage-level dedup (repeated-passage removal over a corpus with
# known duplicates — the doc-copy corpus the exact-dedup query uses)
# ---------------------------------------------------------------------------


def q_dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dd.passage_dedup(_dup_corpus(spark, sf_dir))
    return out.select("doc_id", "n_segments", "n_kept", "clean_text")


_SEG = dd.PASSAGE_TOKENS

ORACLE_DEDUP_PASSAGE = f"""
WITH corpus AS ({_DUP_CORPUS_SQL}),
toks AS (SELECT doc_id, {_TOKS} AS toks FROM corpus),
segd AS (
  SELECT doc_id,
         unnest(list_transform(range(1, CAST(ceil(len(toks) / {_SEG}.0) AS INT) + 1),
                i -> struct_pack(seq := i - 1,
                                 seg := array_to_string(list_slice(toks, (i - 1) * {_SEG} + 1, i * {_SEG}), ' '))),
                recursive := true)
  FROM toks WHERE len(toks) > 0),
hashed AS (SELECT doc_id, seq, seg, {char_hash_sql('seg')} AS h FROM segd),
kept AS (
  SELECT doc_id, seq, seg FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, seq) AS rn FROM hashed)
  WHERE rn = 1),
perdoc AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
         string_agg(seg, ' ' ORDER BY seq) AS clean_text
  FROM kept GROUP BY doc_id)
SELECT t.doc_id,
       CAST(ceil(len(t.toks) / {_SEG}.0) AS INT) AS n_segments,
       coalesce(p.n_kept, 0) AS n_kept,
       coalesce(p.clean_text, '') AS clean_text
FROM toks t LEFT JOIN perdoc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# CDC snapshot merge: fold a deterministic change feed onto the orders
# snapshot. Complements queries_scale.q_cdc_apply (latest-EVENT
# compaction of a single feed): this one merges a BASE SNAPSHOT with an
# explicit I/U/D feed and publishes per-key versions.
# The feed is synthesized from the orders table itself (updates for
# keys ≡0 mod 7, deletes for ≡0 mod 13 — deletes carry the higher
# sequence and win the overlap — inserts cloned to fresh keys for
# ≡0 mod 11), so the oracle can replay it exactly.
# ---------------------------------------------------------------------------

_CDC_PAYLOAD = ["o_totalprice", "o_orderstatus"]
_CDC_INSERT_SHIFT = 100_000_000


def _cdc_feed(o: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    upd = o.where(k % 7 == 0).select(
        k.alias("o_orderkey"),
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        F.lit("P").alias("o_orderstatus"),
        F.lit(1).cast("bigint").alias("seq"),
        F.lit("U").alias("op"),
    )
    dele = o.where(k % 13 == 0).select(
        k.alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
        F.lit(2).cast("bigint").alias("seq"),
        F.lit("D").alias("op"),
    )
    ins = o.where(k % 11 == 0).select(
        (k + _CDC_INSERT_SHIFT).alias("o_orderkey"),
        "o_totalprice",
        F.lit("N").alias("o_orderstatus"),
        F.lit(1).cast("bigint").alias("seq"),
        F.lit("I").alias("op"),
    )
    return upd.unionByName(dele).unionByName(ins)


def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _t(spark, sf_dir, "orders").select("o_orderkey", *_CDC_PAYLOAD)
    snap = cdc.apply_changes(base, _cdc_feed(base), key="o_orderkey")
    return snap.select("o_orderkey", "o_totalprice", "o_orderstatus", "version")


ORACLE_CDC_MERGE = f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, CAST(0 AS BIGINT) AS seq, 'I' AS op
  FROM orders),
feed AS (
  SELECT * FROM base
  UNION ALL
  SELECT o_orderkey, o_totalprice + 100.0, 'P', CAST(1 AS BIGINT), 'U'
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderstatus, CAST(2 AS BIGINT), 'D'
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey + {_CDC_INSERT_SHIFT}, o_totalprice, 'N', CAST(1 AS BIGINT), 'I'
  FROM orders WHERE o_orderkey % 11 = 0),
r AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn,
         max(seq) OVER (PARTITION BY o_orderkey) AS version
  FROM feed)
SELECT o_orderkey, o_totalprice, o_orderstatus, version
FROM r WHERE rn = 1 AND op <> 'D'
"""


# ---------------------------------------------------------------------------
# Deterministic bottom-k stratified sampling: exactly 10 docs per
# source, the 10 with the smallest sampling hash — reproducible across
# engines. Complements queries_scale.q_stratified_sample (per-stratum
# RATE filter): bottom-k gives an exact sample SIZE.
# ---------------------------------------------------------------------------

_SAMPLE_N = 10


def q_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sp.sample_bottomk_stratified(
        _docs(spark, sf_dir), stratum_col="source", key_col="doc_id", n=_SAMPLE_N
    )
    return out.select("doc_id", "source", "sample_rank")


ORACLE_SAMPLE_BOTTOMK = f"""
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY {sp.sample_hash_sql('doc_id')}, doc_id) AS INT) AS sample_rank
  FROM documents)
WHERE sample_rank <= {_SAMPLE_N}
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary and per-doc TF-IDF keywords
# ---------------------------------------------------------------------------

_VOCAB_K = 100
_TFIDF_K = 3

_ORACLE_TF = f"""
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
  GROUP BY doc_id, term
"""


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tx.vocab_topk(_docs(spark, sf_dir), k=_VOCAB_K)
    return out.select("term", "n_occurrences", "n_docs")


ORACLE_VOCAB_TOPK = f"""
WITH tf AS ({_ORACLE_TF})
SELECT term, CAST(sum(tf) AS BIGINT) AS n_occurrences, CAST(count(*) AS BIGINT) AS n_docs
FROM tf GROUP BY term
ORDER BY n_occurrences DESC, term ASC
LIMIT {_VOCAB_K}
"""


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tx.tfidf_topk(_docs(spark, sf_dir), k=_TFIDF_K)
    return out.select("doc_id", "term", "tf", "df_term", "tfidf", "term_rank")


ORACLE_TFIDF = f"""
WITH tf AS ({_ORACLE_TF}),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_term FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS _n FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df_term,
         (t.tf * ((n._n - d.df_term) + 0.5)) / (d.df_term + 0.5) AS tfidf
  FROM tf t JOIN dfq d ON t.term = d.term CROSS JOIN n)
SELECT doc_id, term, tf, df_term, tfidf, term_rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INT) AS term_rank
  FROM scored)
WHERE term_rank <= {_TFIDF_K}
"""


# ---------------------------------------------------------------------------
# Z-order layout stats: Morton-interleave (custkey, order-day), bucket
# by Z-prefix, and report each bucket's (custkey, day) envelope — the
# per-file min/max rectangle a Z-ordered write would give the scan
# planner for two-dimensional pruning.
# ---------------------------------------------------------------------------

_Z_EPOCH = "1992-01-01"
_Z_SHIFT = 18  # 2^24 max zval / 2^18 → ≤ 64 buckets at any SF


def q_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn(
        "o_day", F.expr(f"datediff(cast(o_orderdate as date), date'{_Z_EPOCH}')")
    )
    z = lo.with_zvalue(o, "o_custkey", "o_day")
    return (
        z.withColumn("z_bucket", F.expr(f"shiftright(zval, {_Z_SHIFT})"))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("o_day").alias("min_day"),
            F.max("o_day").alias("max_day"),
        )
    )


_Z_DUCK = lo.zvalue_duck_sql(
    "o_custkey", f"date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE))"
)

ORACLE_ZORDER_STATS = f"""
WITH z AS (
  SELECT o_custkey,
         CAST(date_diff('day', DATE '{_Z_EPOCH}', CAST(o_orderdate AS DATE)) AS INT) AS o_day,
         ({_Z_DUCK} >> {_Z_SHIFT}) AS z_bucket
  FROM orders)
SELECT z_bucket, CAST(count(*) AS BIGINT) AS n_rows,
       min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
       min(o_day) AS min_day, max(o_day) AS max_day
FROM z GROUP BY z_bucket
"""


QUERIES_PIPELINE = {
    "q_dedup_passage": q_dedup_passage,
    "q_cdc_merge": q_cdc_merge,
    "q_sample_bottomk": q_sample_bottomk,
    "q_vocab_topk": q_vocab_topk,
    "q_tfidf": q_tfidf,
    "q_zorder_stats": q_zorder_stats,
}

ORACLE_PIPELINE = {
    "q_dedup_passage": ORACLE_DEDUP_PASSAGE,
    "q_cdc_merge": ORACLE_CDC_MERGE,
    "q_sample_bottomk": ORACLE_SAMPLE_BOTTOMK,
    "q_vocab_topk": ORACLE_VOCAB_TOPK,
    "q_tfidf": ORACLE_TFIDF,
    "q_zorder_stats": ORACLE_ZORDER_STATS,
}


# ---------------------------------------------------------------------------
# Snapshot diff: derive the change feed from two full snapshots (the
# inverse of apply_changes — "two daily dumps, no CDC log")
# ---------------------------------------------------------------------------


def _mutated_snapshot(base: DataFrame) -> DataFrame:
    """Deterministic 'next-day' snapshot: %13 keys deleted, %7 keys
    repriced, %11 keys re-inserted under shifted ids (the same mutation
    family _cdc_feed uses, expressed as a full snapshot)."""
    k = F.col("o_orderkey")
    survived = base.where(k % 13 != 0).select(
        "o_orderkey",
        F.when(k % 7 == 0, F.col("o_totalprice") + F.lit(100.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(k % 7 == 0, F.lit("P")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
    )
    inserted = base.where(k % 11 == 0).select(
        (k + _CDC_INSERT_SHIFT).alias("o_orderkey"),
        "o_totalprice",
        F.lit("N").alias("o_orderstatus"),
    )
    return survived.unionByName(inserted)


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed derived by diffing two snapshots: one full-outer
    equi-join, null-safe struct payload comparison — I for new keys, D
    for vanished keys, U for changed payloads, silence for unchanged.
    apply_changes(old, this) == new is the round-trip law the tests
    pin; here the feed itself is oracle-checked."""
    base = _t(spark, sf_dir, "orders").select("o_orderkey", *_CDC_PAYLOAD)
    return cdc.snapshot_diff(base, _mutated_snapshot(base), key="o_orderkey")


ORACLE_SNAPSHOT_DIFF = f"""
WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 7 = 0 THEN 'P' ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + {_CDC_INSERT_SHIFT}, o_totalprice, 'N'
  FROM orders WHERE o_orderkey % 11 = 0),
d AS (
  SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
         COALESCE(n.o_totalprice, o.o_totalprice) AS o_totalprice,
         COALESCE(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
         CASE WHEN o.o_orderkey IS NULL THEN 'I'
              WHEN n.o_orderkey IS NULL THEN 'D'
              WHEN NOT (n.o_totalprice IS NOT DISTINCT FROM o.o_totalprice
                        AND n.o_orderstatus IS NOT DISTINCT FROM o.o_orderstatus)
                THEN 'U'
         END AS op
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
SELECT o_orderkey, o_totalprice, o_orderstatus,
       CAST(1 AS BIGINT) AS seq, op
FROM d WHERE op IS NOT NULL
"""

QUERIES_PIPELINE["q_snapshot_diff"] = q_snapshot_diff
ORACLE_PIPELINE["q_snapshot_diff"] = ORACLE_SNAPSHOT_DIFF


# ---------------------------------------------------------------------------
# Referential-integrity audit (lakehouse maintenance family, round 6):
# every FK edge of the star schema plus the events->customer behavioral
# edge, as orphan counts. The warehouse-health gate a 100 TB ingest runs
# after each load — the reference's count-reconciliation check
# (…optimized.py:996-1046) generalized from row counts to key integrity.
# ---------------------------------------------------------------------------

_FK_EDGES = [
    # (edge label, child table, child key, parent table, parent key)
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def fk_orphan_counts(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, label: str) -> DataFrame:
    """One FK edge -> one row (edge, n_child, n_orphans, ok).

    Scale shape: the child side pre-aggregates to DISTINCT child keys
    carrying their multiplicities before the join (the q_star_join
    pre-agg-below-join discipline — the shuffle carries #distinct keys,
    not #child rows), the parent side is its distinct key column; a
    NULL child key has no parent by definition and counts as an orphan
    (left join on equality never matches NULL)."""
    ck = child.groupBy(F.col(ckey).alias("_k")).agg(F.count(F.lit(1)).alias("_m"))
    pk = parent.select(F.col(pkey).alias("_p")).distinct()
    j = ck.join(pk, ck._k == pk._p, "left")
    return j.agg(
        F.lit(label).alias("edge"),
        F.sum("_m").alias("n_child"),
        F.sum(F.when(F.col("_p").isNull(), F.col("_m")).otherwise(F.lit(0))).alias("n_orphans"),
    ).withColumn("ok", F.col("n_orphans") == 0)


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    frames = [
        fk_orphan_counts(_t(spark, sf_dir, ct), ck, _t(spark, sf_dir, pt), pk, label)
        for label, ct, ck, pt, pk in _FK_EDGES
    ]
    return reduce(lambda a, b: a.unionByName(b), frames)


def _fk_edge_sql(label: str, ct: str, ck: str, pt: str, pk: str) -> str:
    return f"""
SELECT '{label}' AS edge,
       CAST(sum(_m) AS BIGINT) AS n_child,
       CAST(sum(CASE WHEN p._p IS NULL THEN _m ELSE 0 END) AS BIGINT) AS n_orphans,
       sum(CASE WHEN p._p IS NULL THEN _m ELSE 0 END) = 0 AS ok
FROM (SELECT {ck} AS _k, count(*) AS _m FROM {ct} GROUP BY 1) c
LEFT JOIN (SELECT DISTINCT {pk} AS _p FROM {pt}) p ON c._k = p._p"""


ORACLE_FK_ORPHANS = "\nUNION ALL\n".join(
    _fk_edge_sql(label, ct, ck, pt, pk) for label, ct, ck, pt, pk in _FK_EDGES
)

QUERIES_PIPELINE["q_fk_orphans"] = q_fk_orphans
ORACLE_PIPELINE["q_fk_orphans"] = ORACLE_FK_ORPHANS


# ---------------------------------------------------------------------------
# Cross-document repeated token spans (suffix-array-style substring
# dedup, Lee et al. 2022): maximal verbatim runs >= 12 tokens shared by
# a doc pair, with start positions in both docs — the exact-substring
# complement to the MinHash/SimHash whole-doc families.
# ---------------------------------------------------------------------------

_SPAN_K = 8
_SPAN_MIN = 12
_SPAN_DF_CAP = 50


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-style exact-substring dedup: k-gram anchor postings
    (integer polynomial hashes, never gram strings) self-join on hash,
    and anchors on the same (pair, diagonal) merge into maximal spans
    via gaps-and-islands. Anchors with corpus df outside [2, 50] are
    dropped pre-join (hot boilerplate grams would quadratically blow the
    join; singletons match nothing). See operators/dedup.repeated_spans
    for the 100 TB shuffle story."""
    return dd.repeated_spans(
        _t(spark, sf_dir, "documents"),
        k=_SPAN_K,
        min_span=_SPAN_MIN,
        df_cap=_SPAN_DF_CAP,
    )


ORACLE_DEDUP_SPANS = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
th AS (SELECT doc_id, list_transform(toks, t -> {char_hash_sql('t')}) AS hs FROM toks),
grams AS (
  SELECT doc_id, g.pos AS pos,
         list_reduce(hs[g.pos+1:g.pos+{_SPAN_K}],
                     (a, x) -> (a*31 + x) % {GRAM_MOD}) AS h
  FROM th, LATERAL (SELECT unnest(range(0, greatest(len(hs) - {_SPAN_K - 1}, 0))) AS pos) g),
anchors AS (
  SELECT doc_id, pos, h FROM grams
  WHERE h IN (SELECT h FROM grams GROUP BY h
              HAVING count(*) BETWEEN 2 AND {_SPAN_DF_CAP})),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a, b.pos AS pos_b
  FROM anchors a JOIN anchors b USING (h) WHERE a.doc_id < b.doc_id),
isl AS (
  SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
         pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, pos_a - pos_b
                                    ORDER BY pos_a) AS i
  FROM pairs)
SELECT doc_a, doc_b, CAST(min(pos_a) AS BIGINT) AS start_a,
       CAST(min(pos_b) AS BIGINT) AS start_b,
       count(*) + {_SPAN_K - 1} AS span_tokens
FROM isl GROUP BY doc_a, doc_b, diag, i
HAVING count(*) + {_SPAN_K - 1} >= {_SPAN_MIN}
"""

QUERIES_PIPELINE["q_dedup_spans"] = q_dedup_spans
ORACLE_PIPELINE["q_dedup_spans"] = ORACLE_DEDUP_SPANS


def q_dedup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repeated-span coverage (the Lee et al. trim/drop
    statistic): fraction of tokens inside any cross-doc repeated span
    >= 12 tokens. Interval union per doc via the merge-overlapping
    sweep — all windows partitioned by doc_id."""
    return dd.span_coverage(
        _t(spark, sf_dir, "documents"),
        k=_SPAN_K,
        min_span=_SPAN_MIN,
        df_cap=_SPAN_DF_CAP,
    )


# Tie-proof by construction: ivals is DISTINCT (duplicate intervals —
# one doc sharing the identical span with N partners — are redundant
# to a union), so ORDER BY (s, e) is a TOTAL order within each doc
# partition and the two window scans below cannot disagree on tie
# order. Without the DISTINCT, a duplicated interval could open a
# phantom second island when the engine's tie order differs between
# the island-open scan and the running-sum scan (observed in DuckDB:
# covered_tokens flipped 78/156 across connections).
ORACLE_DEDUP_SPAN_COVERAGE = f"""
WITH spans AS ({ORACLE_DEDUP_SPANS}),
ivals AS (
  SELECT DISTINCT doc_id, s, e FROM (
    SELECT doc_a AS doc_id, start_a AS s, start_a + span_tokens AS e FROM spans
    UNION ALL
    SELECT doc_b AS doc_id, start_b AS s, start_b + span_tokens AS e FROM spans)),
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                  PARTITION BY doc_id ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM ivals),
isl AS (
  SELECT doc_id, s, e,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS i
  FROM marked),
merged AS (SELECT doc_id, i, max(e) - min(s) AS len FROM isl GROUP BY doc_id, i),
covered AS (SELECT doc_id, CAST(sum(len) AS BIGINT) AS covered_tokens
            FROM merged GROUP BY doc_id),
toks AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents)
SELECT c.doc_id, t.n_tokens, c.covered_tokens,
       CAST(c.covered_tokens AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) AS coverage
FROM covered c JOIN toks t USING (doc_id)
"""

QUERIES_PIPELINE["q_dedup_span_coverage"] = q_dedup_span_coverage
ORACLE_PIPELINE["q_dedup_span_coverage"] = ORACLE_DEDUP_SPAN_COVERAGE


def q_dedup_spans_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental substring dedup: a new batch (id-shifted corpus
    copies, so every new doc has a known full-length match) against the
    persisted gram-posting index — corpus touched only through its
    (id, pos, h) postings; shuffle O(batch + matched). The per-gram df
    table is precomputed (gram_df — persisted with the index at build
    time in production) so the batch lookup never re-aggregates the
    full posting table."""
    docs = _t(spark, sf_dir, "documents")
    index_grams = dd.register_cache(
        dd.gram_hash_positions(docs, k=_SPAN_K)
    )
    index_df = dd.register_cache(dd.gram_df(index_grams))
    batch = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return dd.repeated_spans_lookup(
        batch,
        index_grams,
        k=_SPAN_K,
        min_span=_SPAN_MIN,
        df_cap=_SPAN_DF_CAP,
        index_df=index_df,
    )


ORACLE_DEDUP_SPANS_INC = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
th AS (SELECT doc_id, list_transform(toks, t -> {char_hash_sql('t')}) AS hs FROM toks),
grams AS (
  SELECT doc_id, g.pos AS pos,
         list_reduce(hs[g.pos+1:g.pos+{_SPAN_K}],
                     (a, x) -> (a*31 + x) % {GRAM_MOD}) AS h
  FROM th, LATERAL (SELECT unnest(range(0, greatest(len(hs) - {_SPAN_K - 1}, 0))) AS pos) g),
idx AS (
  SELECT doc_id AS corpus_id, pos AS pos_c, h FROM grams
  WHERE h IN (SELECT h FROM grams GROUP BY h HAVING count(*) <= {_SPAN_DF_CAP})),
nb AS (SELECT doc_id + 1000000 AS new_id, pos AS pos_n, h FROM grams),
pairs AS (
  SELECT new_id, corpus_id, pos_n, pos_c FROM nb JOIN idx USING (h)),
isl AS (
  SELECT new_id, corpus_id, pos_n, pos_c, pos_n - pos_c AS diag,
         pos_n - row_number() OVER (PARTITION BY new_id, corpus_id, pos_n - pos_c
                                    ORDER BY pos_n) AS i
  FROM pairs)
SELECT new_id, corpus_id, CAST(min(pos_n) AS BIGINT) AS start_new,
       CAST(min(pos_c) AS BIGINT) AS start_corpus,
       count(*) + {_SPAN_K - 1} AS span_tokens
FROM isl GROUP BY new_id, corpus_id, diag, i
HAVING count(*) + {_SPAN_K - 1} >= {_SPAN_MIN}
"""

QUERIES_PIPELINE["q_dedup_spans_inc"] = q_dedup_spans_inc
ORACLE_PIPELINE["q_dedup_spans_inc"] = ORACLE_DEDUP_SPANS_INC
