"""Round-9 corpus-analytics battery: source-overlap matrix, MinHash
S-curve, token coverage, n-gram diversity, tokenizer fertility —
first-principles Python references recomputed per test (exact integer
counting in Python, one final float division — the same op order as
the Spark plans), so these are engine-vs-math checks, not
engine-vs-itself.

Reference parity note: the reference pipeline has no corpus-analytics
surface — this family is part of the training-data extension
(SURVEY.md LLM-prep battery)."""

from __future__ import annotations

import re
from collections import Counter

import duckdb

from airflow_crypto_etl_spark.operators import dedup as dd
from airflow_crypto_etl_spark.operators.dedup import MINHASH_K
from airflow_crypto_etl_spark.queries_corpus import (
    COVERAGE_KS,
    q_fertility,
    q_minhash_curve,
    q_ngram_diversity,
    q_source_overlap,
    q_token_coverage,
)
from airflow_crypto_etl_spark.sources.tables import load_table

from conftest import SF_DIR

_SUBWORD_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")


def _docs_rows():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _words(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def _pieces(text: str, max_piece: int = 4) -> list[str]:
    out = []
    for run in _SUBWORD_RE.findall(text):
        out.extend(run[i : i + max_piece] for i in range(0, len(run), max_piece))
    return out


# ---------------------------------------------------------------------------
# Tokenizer fertility
# ---------------------------------------------------------------------------


def test_fertility_matches_python_reference(spark, sf_dir):
    got = {r["lang"]: r for r in q_fertility(spark, sf_dir).collect()}
    by_lang: dict[str, list[int]] = {}
    for _id, text, lang, _src in _docs_rows():
        n_docs, n_words, n_pieces = by_lang.setdefault(lang, [0, 0, 0])
        by_lang[lang] = [n_docs + 1, n_words + len(_words(text)), n_pieces + len(_pieces(text))]
    assert set(got) == set(by_lang)
    for lang, (n_docs, n_words, n_pieces) in by_lang.items():
        r = got[lang]
        assert (r["n_docs"], r["n_words"], r["n_pieces"]) == (n_docs, n_words, n_pieces)
        assert r["fertility"] == n_pieces / n_words


# ---------------------------------------------------------------------------
# N-gram diversity
# ---------------------------------------------------------------------------


def test_ngram_diversity_matches_python_reference(spark, sf_dir):
    got = {r["source"]: r for r in q_ngram_diversity(spark, sf_dir).collect()}
    uni: dict[str, Counter] = {}
    bi: dict[str, Counter] = {}
    for _id, text, _lang, src in _docs_rows():
        w = _words(text)
        uni.setdefault(src, Counter()).update(w)
        bi.setdefault(src, Counter()).update(
            f"{a} {b}" for a, b in zip(w, w[1:])
        )
    assert set(got) == set(uni)
    for src, cu in uni.items():
        cb = bi.get(src, Counter())
        r = got[src]
        assert r["n_tokens"] == sum(cu.values())
        assert r["n_types"] == len(cu)
        assert r["n_bigrams"] == sum(cb.values())
        assert r["n_bigram_types"] == len(cb)
        assert r["ttr"] == len(cu) / sum(cu.values())
        if sum(cb.values()):
            assert r["distinct2"] == len(cb) / sum(cb.values())
        else:
            assert r["distinct2"] is None


# ---------------------------------------------------------------------------
# Token coverage curve
# ---------------------------------------------------------------------------


def test_token_coverage_matches_python_reference(spark, sf_dir):
    got = {r["k"]: r for r in q_token_coverage(spark, sf_dir).collect()}
    vocab = Counter()
    for _id, text, _lang, _src in _docs_rows():
        vocab.update(_words(text))
    total = sum(vocab.values())
    # ties broken by term ASC after count DESC — total order, same as both engines
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    assert set(got) == set(COVERAGE_KS)
    for k in COVERAGE_KS:
        top = ranked[:k]
        cum = sum(c for _t, c in top)
        r = got[k]
        assert r["n_terms"] == len(top)
        assert r["cum_tokens"] == cum
        assert r["total_tokens"] == total
        assert r["vocab_size"] == len(vocab)
        assert r["coverage"] == cum / total

    # the curve is monotone in k and coverage is a proper share
    cov = [got[k]["coverage"] for k in sorted(COVERAGE_KS)]
    assert cov == sorted(cov) and 0.0 < cov[0] and cov[-1] <= 1.0


# ---------------------------------------------------------------------------
# Source overlap matrix + MinHash S-curve: exact rollups of the
# (already parity-tested) LSH pair set
# ---------------------------------------------------------------------------


def test_source_overlap_is_exact_pair_rollup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, threshold=0.5).collect()
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    cells: dict[tuple[str, str], list[int]] = {}
    for p in pairs:
        a, b = sorted((src[p["doc_a"]], src[p["doc_b"]]))
        n, m = cells.setdefault((a, b), [0, 0])
        cells[(a, b)] = [n + 1, m + round(p["est_jaccard"] * MINHASH_K)]
    got = {(r["source_a"], r["source_b"]): r for r in q_source_overlap(spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for key, (n, m) in cells.items():
        r = got[key]
        assert r["n_pairs"] == n
        assert r["avg_jaccard"] == m / (n * MINHASH_K)
        assert 0.5 <= r["avg_jaccard"] <= 1.0  # pairs pre-filtered at 0.5


def test_minhash_curve_buckets_every_candidate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cand = dd.minhash_lsh_pairs(docs, threshold=0.0).collect()
    want = Counter((round(p["est_jaccard"] * MINHASH_K) * 10) // MINHASH_K for p in cand)
    got = {r["bucket"]: r["n_pairs"] for r in q_minhash_curve(spark, sf_dir).collect()}
    assert got == dict(want)
    # the 0.5-threshold pair set is exactly the curve's mass at bucket >= 5
    n_above = sum(n for b, n in got.items() if b >= 5)
    assert n_above == len(dd.minhash_lsh_pairs(docs, threshold=0.5).collect())


# ---------------------------------------------------------------------------
# Matryoshka dimension-truncation recall (registered in
# queries_selection; tested here with the round's python references)
# ---------------------------------------------------------------------------


def test_dim_truncated_recall_matches_python_reference(spark, sf_dir):
    import numpy as np

    from airflow_crypto_etl_spark.operators import similarity as sim
    from airflow_crypto_etl_spark.queries_ext import ANN_QUERY_IDS

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)

    def topk(d: int, qid: int, k: int = 10) -> set[int]:
        q = mat[ids == qid][0][:d]
        d2 = ((mat[:, :d] - q) ** 2).sum(axis=1)
        order = sorted(
            (float(d2[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != qid
        )
        return {nid for _d, nid in order[:k]}

    want = {}
    for qid in ANN_QUERY_IDS:
        truth = topk(64, qid)
        for d in sim.MRL_DIMS:
            want[(d, qid)] = len(topk(d, qid) & truth) / len(truth)

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["dim"], r["query_id"]): r["recall"]
        for r in sim.dim_truncated_recall(emb, ANN_QUERY_IDS, k=10).collect()
    }
    assert got == want
    # more prefix dimensions help on average — an empirical property of
    # the fixture, not a theorem of prefix truncation, so tolerate a
    # small dip rather than pinning exact monotonicity (ADVICE r9)
    import statistics as st

    means = [st.mean(v for (d, _q), v in got.items() if d == dd_) for dd_ in sim.MRL_DIMS]
    for lo, hi in zip(means, means[1:]):
        assert hi >= lo - 0.05


# ---------------------------------------------------------------------------
# IVF batch lookup (registered in queries_selection): python-reference
# equivalence on real data + the degenerate-list wholesale-drop guard
# ---------------------------------------------------------------------------


def test_ivf_batch_lookup_finds_originals(spark, sf_dir):
    """Every id-shifted batch vector's top neighbor must be its own
    original at cos ~1.0 — the index-correctness witness the
    registered query doubles as."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    batch = emb.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    out = sim.ivf_batch_lookup(emb, batch, k=10, spread=False).collect()
    top = {r["query_id"]: r for r in out if r["rank"] == 1}
    n_batch = batch.count()
    assert len(top) == n_batch
    for qid, r in top.items():
        assert r["neighbor_id"] == qid - 1000000
        assert abs(r["cos"] - 1.0) < 1e-9


def test_ivf_batch_lookup_drops_degenerate_list_wholesale(spark):
    """A collapsed quantizer list (here: 300 near-identical vectors all
    assigned to one centroid) above ``list_cap`` is dropped WHOLESALE:
    no candidate may come from it, while healthy lists keep serving.
    This pins the guard the registered query carries at 2x mean
    occupancy (which healthy near-uniform corpora never trip)."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.operators import similarity as sim

    dim = 8
    # centroid convention: ids 0..15 are the seeds. Give ids 16..315 a
    # vector ~= seed 0 (the hot list); ids 316..345 sit near seed 1.
    def vec(seed_like: int, eps: int) -> list[float]:
        v = [0.0] * dim
        v[seed_like] = 1.0
        v[(seed_like + 1) % dim] = eps * 1e-4
        return v

    rows = [(i, vec(i % dim, 0)) for i in range(16)]
    rows += [(16 + j, vec(0, j + 1)) for j in range(300)]       # hot list 0
    rows += [(316 + j, vec(1, j + 1)) for j in range(30)]       # healthy list 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    batch = emb.filter((F.col("vec_id") >= 16)).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    n = len(rows)
    cap = (2 * n) // 16  # 43 — the hot list (301 members incl. seed) trips it
    out = sim.ivf_batch_lookup(emb, batch, k=5, list_cap=cap, spread=False).collect()
    hot_members = {i for i in range(16, 316)} | {0}
    assert all(r["neighbor_id"] not in hot_members for r in out)
    # healthy-list queries still get their neighbors (incl. their own original)
    healthy_queries = {316 + j + 1000000 for j in range(30)}
    got_q = {r["query_id"] for r in out}
    assert healthy_queries <= got_q
    for r in out:
        if r["query_id"] in healthy_queries and r["rank"] == 1:
            assert r["neighbor_id"] == r["query_id"] - 1000000


# ---------------------------------------------------------------------------
# Persisted IVF index (r10): parquet round-trip exactness + the
# incremental contract (build once, look up many batches)
# ---------------------------------------------------------------------------


def test_ivf_index_roundtrip_matches_rebuild(spark, sf_dir, tmp_path):
    """ivf_index_build → parquet → ivf_index_lookup must return
    byte-identical rows to the rebuild-per-call ivf_batch_lookup on
    the same batch: the index columns are plain double/bigint, so
    persistence cannot perturb a single rank or cosine."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cap = (2 * emb.count()) // 16
    batch = emb.filter(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    cents, assign = sim.ivf_index_build(emb, list_cap=cap, spread=False)
    cents.write.parquet(str(tmp_path / "centroids"))
    assign.write.parquet(str(tmp_path / "assign"))
    persisted = sim.ivf_index_lookup(
        batch, emb,
        spark.read.parquet(str(tmp_path / "centroids")),
        spark.read.parquet(str(tmp_path / "assign")),
        k=10, spread=False,
    )
    rebuilt = sim.ivf_batch_lookup(emb, batch, k=10, list_cap=cap, spread=False)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = sorted(persisted.collect(), key=key)
    want = sorted(rebuilt.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got  # non-vacuous


def test_ivf_index_serves_multiple_batches(spark, sf_dir, tmp_path):
    """The incremental contract: ONE persisted index serves every
    ingest batch — three disjoint id-slices each find their own
    original at rank 1 through the same stored (centroids, assign)
    pair, with no rebuild between lookups."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents, assign = sim.ivf_index_build(emb, spread=False)
    cents.write.parquet(str(tmp_path / "centroids"))
    assign.write.parquet(str(tmp_path / "assign"))
    cents_p = spark.read.parquet(str(tmp_path / "centroids"))
    assign_p = spark.read.parquet(str(tmp_path / "assign"))
    for residue in (0, 1, 2):
        batch = emb.filter(F.col("vec_id") % 40 == residue).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
        )
        out = sim.ivf_index_lookup(batch, emb, cents_p, assign_p, k=5, spread=False)
        top = {r["query_id"]: r for r in out.collect() if r["rank"] == 1}
        assert len(top) == batch.count()
        for qid, r in top.items():
            assert r["neighbor_id"] == qid - 1000000
            assert abs(r["cos"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# Corpus drift by ingest day (r10)
# ---------------------------------------------------------------------------


def test_corpus_drift_matches_python_reference(spark, sf_dir):
    """JSD of each day's (source × quality-tier) profile vs the
    trailing corpus, recomputed first-principles in python (counts
    exact; ln to float tolerance — JVM vs libm ulp)."""
    import math

    from airflow_crypto_etl_spark.queries_corpus import (
        DRIFT_DAYS,
        DRIFT_QBUCKETS,
        q_corpus_drift,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    from airflow_crypto_etl_spark.operators.text import STOPWORDS

    stop = set(STOPWORDS["en"])

    def qscore(text):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            return 0.0
        n = len(toks)
        return (
            min(n / 100.0, 1.0) * 0.4
            + (len(set(toks)) / n) * 0.4
            + min(sum(1 for t in toks if t in stop) * 5.0 / n, 1.0) * 0.2
        )

    cells: dict[int, Counter] = {d: Counter() for d in range(DRIFT_DAYS)}
    for doc_id, text, src in rows:
        qb = min(int(math.floor(qscore(text) * DRIFT_QBUCKETS)), DRIFT_QBUCKETS - 1)
        cells[doc_id % DRIFT_DAYS][(src, qb)] += 1

    got = {r["dt"]: r for r in q_corpus_drift(spark, sf_dir).collect()}
    assert set(got) == set(range(1, DRIFT_DAYS))  # day 0 has no trailing corpus
    support = set().union(*(set(c) for c in cells.values()))
    for d in range(1, DRIFT_DAYS):
        trail = Counter()
        for dd_ in range(d):
            trail.update(cells[dd_])
        n_p, n_q = sum(cells[d].values()), sum(trail.values())
        jsd = 0.0
        for cell in support:
            p = cells[d].get(cell, 0) / n_p
            q = trail.get(cell, 0) / n_q
            m = (p + q) / 2.0
            jsd += (
                (p * math.log(p) if p > 0 else 0.0)
                + (q * math.log(q) if q > 0 else 0.0)
            ) / 2.0 - (m * math.log(m) if m > 0 else 0.0)
        r = got[d]
        assert r["n_docs"] == n_p and r["n_trailing"] == n_q
        assert abs(r["jsd_nats"] - jsd) < 1e-9
        assert -1e-12 <= r["jsd_nats"] <= math.log(2.0) + 1e-12
        assert abs(r["jsd_bits"] - r["jsd_nats"] / math.log(2.0)) < 1e-12


def test_ivf_index_append_equals_rebuild_and_replay_noop(spark, sf_dir, tmp_path):
    """The growing-index contract (r11): build over the corpus MINUS
    two id-slices, append each slice batch_id-partitioned (a REPLAYED
    batch overwrites its own partition — a no-op), and the grown
    assign table is row-identical to a rebuild over the union corpus
    with the same quantizer; a capped lookup through the grown index
    equals the one-shot rebuild lookup."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(~(F.col("vec_id") % 40).isin([21, 22]))
    cents, assign0 = sim.ivf_index_build(base, n_centroids=16, spread=False)
    cents.write.parquet(str(tmp_path / "centroids"))
    cents_p = spark.read.parquet(str(tmp_path / "centroids"))

    def put(rows, b):
        (rows.withColumn("batch_id", F.lit(b))
         .write.mode("overwrite").partitionBy("batch_id")
         .option("partitionOverwriteMode", "dynamic")
         .parquet(str(tmp_path / "assign")))

    put(assign0, 0)
    b21 = emb.filter(F.col("vec_id") % 40 == 21)
    b22 = emb.filter(F.col("vec_id") % 40 == 22)
    put(sim.ivf_index_append(b21, cents_p, spread=False), 1)
    put(sim.ivf_index_append(b22, cents_p, spread=False), 2)
    put(sim.ivf_index_append(b21, cents_p, spread=False), 1)  # replay: no-op

    grown = spark.read.parquet(str(tmp_path / "assign")).select("cid", "vec_id")
    _, rebuilt = sim.ivf_index_build(
        emb, spread=False, centroids=cents_p.select("cid", "cv")
    )
    got = sorted((r["cid"], r["vec_id"]) for r in grown.collect())
    want = sorted((r["cid"], r["vec_id"]) for r in rebuilt.collect())
    assert got == want and len(got) == emb.count()  # replay added nothing

    cap = (2 * emb.count()) // 16
    batch = emb.filter(F.col("vec_id") % 40 == 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    through_grown = sim.ivf_index_lookup(
        batch, emb, cents_p, sim.ivf_index_cap(grown, cap), k=10, spread=False
    )
    one_shot = sim.ivf_batch_lookup(
        emb, batch, k=10, list_cap=cap, spread=False,
        centroids=cents_p.select("cid", "cv"),
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    a = sorted(through_grown.collect(), key=key)
    b = sorted(one_shot.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a


def test_ivf_index_build_sqrt_default(spark, sf_dir):
    """n_centroids=None applies the FAISS nlist ≈ √N rule: the
    quantizer is seeded with ⌈√N⌉ centroids and still assigns every
    corpus vector exactly once."""
    import math

    from airflow_crypto_etl_spark.operators import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    cents, assign = sim.ivf_index_build(emb, n_centroids=None, spread=False)
    want = math.isqrt(n - 1) + 1
    assert cents.count() == want
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n
