"""Round-9 selection battery: DSIR, CCNet buckets, PQ/ADC ANN,
winnowing fingerprints — first-principles Python references recomputed
per test (sequential IEEE folds, same op order as the Spark plans), so
these are engine-vs-math checks, not engine-vs-itself.

Reference parity note: the reference pipeline has no data-selection or
fingerprinting surface — this family is part of the training-data
extension (SURVEY.md LLM-prep battery)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import llm_prep as lp
from airflow_crypto_etl_spark.operators import similarity as sim
from airflow_crypto_etl_spark.operators import text as tx
from airflow_crypto_etl_spark.queries_selection import (
    q_ann_ivfpq,
    q_ann_ivfpq_recall,
    q_ann_pq,
    q_ann_pq_recall,
    q_ccnet_buckets,
    q_dsir,
)
from airflow_crypto_etl_spark.sources.tables import load_table

from conftest import SF_DIR

CHAR_MOD = 1 << 30
Q20 = 1 << 20


def _docs_rows():
    return duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def _emb_rows():
    return duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()


# ---------------------------------------------------------------------------
# Winnowing — python reference equivalence
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int = 8, w: int = 4):
    codes = [ord(c) for c in text]
    n = len(codes)
    if n < k + w - 1:
        return None
    gh = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h = h * 31 + codes[i + j]
        gh.append(h % CHAR_MOD)
    picked = set()
    for p in range(len(gh) - w + 1):
        # min hash, rightmost on ties == lexicographic min of (h, -pos)
        best = min((gh[p + j], -(p + j + 1)) for j in range(w))
        picked.add(best)
    return len(gh), len(picked), sum(h for h, _ in picked)


def test_winnow_matches_python_reference(spark, sf_dir):
    out = {
        r["doc_id"]: (r["n_grams"], r["n_selected"], r["fp_checksum"])
        for r in tx.winnow_fingerprints(load_table(spark, sf_dir, "documents")).collect()
    }
    checked = 0
    for doc_id, text, _lang in _docs_rows():
        ref = _py_winnow(text)
        if ref is None:
            assert doc_id not in out
            continue
        assert out[doc_id] == ref, f"doc {doc_id}"
        checked += 1
    assert checked >= 400


def test_winnow_shared_substring_guarantee(spark):
    """The winnowing guarantee: two docs sharing a substring of length
    >= k + w - 1 = 11 share at least one fingerprint HASH (position
    differs, hash set intersects)."""
    shared = "the quick brown fox jumps over"
    df = spark.createDataFrame(
        [(1, "AAAA " + shared + " BBBB"), (2, "zzzz " + shared + " qqqq")],
        ["doc_id", "text"],
    )
    # recompute hash sets with the python reference
    texts = {r["doc_id"]: r["text"] for r in df.collect()}

    def hash_set(t):
        codes = [ord(c) for c in t]
        gh = []
        for i in range(len(codes) - 7):
            h = 0
            for j in range(8):
                h = h * 31 + codes[i + j]
            gh.append(h % CHAR_MOD)
        return {
            min((gh[p + j], -(p + j + 1)) for j in range(4))[0]
            for p in range(len(gh) - 3)
        }

    assert hash_set(texts[1]) & hash_set(texts[2])
    # and the operator agrees with the reference on these rows
    got = {r["doc_id"]: r["n_selected"] for r in tx.winnow_fingerprints(df).collect()}
    assert got[1] > 0 and got[2] > 0


# ---------------------------------------------------------------------------
# DSIR — python reference equivalence
# ---------------------------------------------------------------------------


def _py_char_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % CHAR_MOD
    return h


def test_dsir_matches_python_reference(spark, sf_dir):
    B = lp.DSIR_BUCKETS
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    raw_docs: dict[int, list[int]] = {}
    for doc_id, text, lang in _docs_rows():
        toks = [t for t in text.split(" ") if t]
        buckets = [_py_char_hash(t) % B for t in toks]
        if lang == "en":
            for b in buckets:
                ct[b] = ct.get(b, 0) + 1
        else:
            raw_docs[doc_id] = buckets
            for b in buckets:
                cr[b] = cr.get(b, 0) + 1
    n_t, n_r = sum(ct.values()), sum(cr.values())
    lrq = {
        b: math.floor(
            math.log(((ct.get(b, 0) + 1) * (n_r + B)) / ((c + 1) * (n_t + B))) * Q20
        )
        for b, c in cr.items()
    }
    scores = {
        d: (len(bs), sum(lrq[b] for b in bs)) for d, bs in raw_docs.items()
    }
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:100]

    got = q_dsir(spark, sf_dir).collect()
    assert len(got) == 100
    got_sorted = sorted(got, key=lambda r: (-r["dsir_score"], r["doc_id"]))
    for row, (doc_id, (n_tokens, q)) in zip(got_sorted, expect):
        assert row["doc_id"] == doc_id
        assert row["n_tokens"] == n_tokens
        # ln parity: python libm vs JVM Math.log — allow one quantum
        # per bucket-term; scores are ~1e5 quanta wide
        assert abs(row["dsir_score"] - q / Q20) < 1e-3


# ---------------------------------------------------------------------------
# CCNet buckets — structural properties
# ---------------------------------------------------------------------------


def test_ccnet_bucket_structure(spark, sf_dir):
    rows = q_ccnet_buckets(spark, sf_dir).collect()
    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        assert r["bucket"] in (1, 2, 3)
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r["n_docs"]
    assert set(by_lang) == {"en", "de", "es", "fr", "zh"}
    for lang, buckets in by_lang.items():
        sizes = [buckets.get(b, 0) for b in (1, 2, 3)]
        # ntile: sizes differ by at most 1, earlier tiles never smaller
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert sizes[0] >= sizes[1] >= sizes[2], (lang, sizes)


def test_ccnet_head_scores_dominate(spark, sf_dir):
    """Mean LM score must be non-increasing head → middle → tail within
    every language (the whole point of the bucketing)."""
    rows = q_ccnet_buckets(spark, sf_dir).collect()
    by_lang: dict[str, dict[int, float]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r["avg_lm_score"]
    for lang, m in by_lang.items():
        assert m[1] >= m[2] >= m[3], (lang, m)


# ---------------------------------------------------------------------------
# PQ — python reference equivalence and recall gate
# ---------------------------------------------------------------------------


def _py_pq(emb_rows, n_sub=4, n_cent=16, dim=64, k=10, query_ids=range(8), cents=None):
    sd = dim // n_sub
    vecs = {vid: [float(x) for x in v] for vid, v in emb_rows}
    if cents is None:
        cents = {cid: vecs[cid] for cid in range(n_cent)}

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def sub(v, s):
        return v[s * sd : (s + 1) * sd]

    codes = {
        vid: [
            min(((d2(sub(v, s), sub(cv, s)), cid) for cid, cv in sorted(cents.items())))[1]
            for s in range(n_sub)
        ]
        for vid, v in vecs.items()
    }
    out = {}
    for q in query_ids:
        qv = vecs[q]
        lut = {
            (s, cid): d2(sub(qv, s), sub(cv, s))
            for s in range(n_sub)
            for cid, cv in cents.items()
        }
        scored = []
        for vid, cs in codes.items():
            if vid == q:
                continue
            adc = 0.0
            for s in range(n_sub):
                adc = adc + lut[(s, cs[s])]
            scored.append((adc, vid))
        scored.sort()
        out[q] = [(vid, adc) for adc, vid in scored[:k]]
    return out


def test_pq_matches_python_reference(spark, sf_dir):
    ref = _py_pq(_emb_rows())
    got: dict[int, list] = {}
    for r in q_ann_pq(spark, sf_dir).orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["adc"]))
    assert set(got) == set(ref)
    for q in ref:
        assert [v for v, _ in got[q]] == [v for v, _ in ref[q]], f"query {q}"
        for (_, a), (_, b) in zip(got[q], ref[q]):
            assert a == b  # bit-identical sequential folds


def test_pq_encode_contract(spark, sf_dir):
    enc = sim.pq_encode(load_table(spark, sf_dir, "embeddings")).collect()
    assert len(enc) == len(_emb_rows())
    for r in enc:
        assert len(r["codes"]) == sim.PQ_SUB
        assert all(0 <= c < sim.PQ_CENT for c in r["codes"])
    # centroids encode to themselves (their own subvector distance is 0)
    own = {r["vec_id"]: r["codes"] for r in enc if r["vec_id"] < sim.PQ_CENT}
    vecs = {vid: v for vid, v in _emb_rows() if vid < sim.PQ_CENT}
    for vid, codes in own.items():
        for s, c in enumerate(codes):
            # chosen centroid's subvector must be at distance 0 from the
            # vector's own subvector (== its own, or an exact duplicate)
            a = vecs[vid][s * 16 : (s + 1) * 16]
            b = vecs[c][s * 16 : (s + 1) * 16]
            assert list(a) == list(b)


def test_pq_recall_bounds(spark, sf_dir):
    rows = q_ann_pq_recall(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
    # 16 centroids × 4 subspaces on clustered data should beat random
    assert sum(r["recall"] for r in rows) / len(rows) >= 0.3


# ---------------------------------------------------------------------------
# IVFADC — python reference equivalence and recall gate
# ---------------------------------------------------------------------------


def _py_ivfpq(emb_rows, n_coarse=16, n_probe=4, n_sub=4, dim=64, k=10, query_ids=range(8),
              rcb=None):
    sd = dim // n_sub
    vecs = {vid: [float(x) for x in v] for vid, v in emb_rows}
    coarse = {cid: vecs[cid] for cid in range(n_coarse)}

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    assign = {
        vid: min((d2(v, cv), cid) for cid, cv in sorted(coarse.items()))[1]
        for vid, v in vecs.items()
    }
    resid = {
        vid: [x - y for x, y in zip(v, coarse[assign[vid]])] for vid, v in vecs.items()
    }
    if rcb is None:
        rcb = {rid: resid[rid + n_coarse] for rid in range(16)}

    def sub(v, s):
        return v[s * sd : (s + 1) * sd]

    codes = {
        vid: [
            min(((d2(sub(r, s), sub(rv, s)), rid) for rid, rv in sorted(rcb.items())))[1]
            for s in range(n_sub)
        ]
        for vid, r in resid.items()
    }
    out = {}
    for q in query_ids:
        qv = vecs[q]
        probed = sorted((d2(qv, cv), cid) for cid, cv in coarse.items())[:n_probe]
        scored = []
        for _, cid in probed:
            qr = [x - y for x, y in zip(qv, coarse[cid])]
            lut = {
                (s, rid): d2(sub(qr, s), sub(rv, s))
                for s in range(n_sub)
                for rid, rv in rcb.items()
            }
            for vid, lid in assign.items():
                if lid != cid or vid == q:
                    continue
                adc = 0.0
                for s in range(n_sub):
                    adc = adc + lut[(s, codes[vid][s])]
                scored.append((adc, vid))
        scored.sort()
        out[q] = [(vid, adc) for adc, vid in scored[:k]]
    return out


def test_ivfpq_matches_python_reference(spark, sf_dir):
    ref = _py_ivfpq(_emb_rows())
    got: dict[int, list] = {}
    for r in q_ann_ivfpq(spark, sf_dir).orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["adc"]))
    assert set(got) == set(ref)
    for q in ref:
        assert [v for v, _ in got[q]] == [v for v, _ in ref[q]], f"query {q}"
        for (_, a), (_, b) in zip(got[q], ref[q]):
            assert a == b  # bit-identical sequential folds


def test_ivfpq_recall_bounds(spark, sf_dir):
    rows = q_ann_ivfpq_recall(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0


# ---------------------------------------------------------------------------
# Winnow pairs — overlap detection + df-cap behavior
# ---------------------------------------------------------------------------


def test_winnow_pairs_detects_shared_run(spark):
    shared = "the quick brown fox jumps over the lazy dog again"
    rows = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " unique tail one here"),
            (2, "zzzz " + shared + " entirely different ending"),
            (3, "no overlap with anything else at all in this document"),
        ],
        ["doc_id", "text"],
    )
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in
           __import__("airflow_crypto_etl_spark.operators.text", fromlist=["x"]).winnow_pairs(
               rows, min_shared=3, df_cap=20).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 3
    assert not any(3 in pair for pair in got)


def test_winnow_pairs_df_cap_drops_boilerplate(spark):
    """25 docs sharing one boilerplate sentence (df=25 > cap=20): every
    boilerplate fingerprint is dropped wholesale, so no pair survives;
    with the cap lifted the C(25,2) pairs appear."""
    from airflow_crypto_etl_spark.operators.text import winnow_pairs

    boiler = "all rights reserved click here to unsubscribe from this list"
    df = spark.createDataFrame(
        [(i, f"doc number {i} distinct words " + boiler) for i in range(25)],
        ["doc_id", "text"],
    )
    capped = winnow_pairs(df, min_shared=3, df_cap=20).count()
    uncapped = winnow_pairs(df, min_shared=3, df_cap=None).count()
    assert capped == 0
    assert uncapped == 25 * 24 // 2


# ---------------------------------------------------------------------------
# Trained codebooks (r10): one exact per-subspace Lloyd round — python
# reference parity of the codebook itself, the searches it feeds, and
# the measured recall behavior vs the seeded floor
# ---------------------------------------------------------------------------

_POW2_60_INT = 1 << 60
_POW2_60_F = 1152921504606846976.0


def _q60(x: float) -> int:
    """2^60-scale + DECIMAL(38,0) cast, python twin: the product is
    exact (power-of-two multiply), but a coordinate below 2^-37 makes
    it non-integral — both engines' decimal casts round HALF-UP there,
    so the reference must too (plain int() truncates).

    Parity caveat pinned by these tests: Spark's double→decimal cast
    is STRING-mediated (shortest round-trip repr, 17 significant
    digits), so a quantum ≥ ~2^57 can land a few ulps off the exact
    integer. The sums stay order-free/deterministic (each value's cast
    is itself deterministic), and the final means agree with this
    exact-integer reference to ~1e-15 relative — hence isclose below,
    not ==, mirroring the kmeans numpy-parity tests."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x * _POW2_60_F).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


def _py_train_subspace_round(vecs_by_key, seed_cents, n_sub=4, dim=64):
    """One Lloyd round per subspace over ``vecs_by_key`` (exact
    integer sums of 2^60-scaled coordinates, one float division chain
    — the operators/similarity decimal idiom in pure Python). Returns
    the new full-dim centroid dict; empty cells keep seed values."""
    sd = dim // n_sub

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def sub(v, s):
        return v[s * sd : (s + 1) * sd]

    new = {cid: list(cv) for cid, cv in seed_cents.items()}
    for s in range(n_sub):
        groups: dict[int, list] = {}
        for _vid, v in sorted(vecs_by_key.items()):
            best = min((d2(sub(v, s), sub(cv, s)), cid) for cid, cv in sorted(seed_cents.items()))[1]
            groups.setdefault(best, []).append(v)
        for cid, members in groups.items():
            for i in range(sd):
                total = sum(_q60(m[s * sd + i]) for m in members)
                new[cid][s * sd + i] = float(total) / _POW2_60_F / len(members)
    return new


def test_pq_trained_codebook_matches_python_reference(spark, sf_dir):
    rows = _emb_rows()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    seed = {cid: vecs[cid] for cid in range(16)}
    want = _py_train_subspace_round(vecs, seed)
    cb = sim.pq_codebook_trained(load_table(spark, sf_dir, "embeddings")).collect()
    got = {e["cid"]: list(e["cv"]) for e in cb[0]["cb"]}
    assert set(got) == set(want)
    for cid in want:
        assert all(_close(a, b) for a, b in zip(got[cid], want[cid])), cid


def test_pq_trained_search_matches_python_reference(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_selection import q_ann_pq_trained

    rows = _emb_rows()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    seed = {cid: vecs[cid] for cid in range(16)}
    trained = _py_train_subspace_round(vecs, seed)
    ref = _py_pq(rows, cents=trained)
    got: dict[int, list] = {}
    for r in q_ann_pq_trained(spark, sf_dir).orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["adc"]))
    assert set(got) == set(ref)
    for q in ref:
        assert [v for v, _ in got[q]] == [v for v, _ in ref[q]], f"query {q}"
        for (_, a), (_, b) in zip(got[q], ref[q]):
            assert _close(a, b)  # trained centroids: see _q60 parity caveat


def _py_residuals(rows, n_coarse=16):
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    coarse = {cid: vecs[cid] for cid in range(n_coarse)}

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    assign = {
        vid: min((d2(v, cv), cid) for cid, cv in sorted(coarse.items()))[1]
        for vid, v in vecs.items()
    }
    return {
        vid: [x - y for x, y in zip(v, coarse[assign[vid]])] for vid, v in vecs.items()
    }


def test_ivfpq_trained_rcb_matches_python_reference(spark, sf_dir):
    rows = _emb_rows()
    resid = _py_residuals(rows)
    seed = {rid: resid[rid + 16] for rid in range(16)}
    want = _py_train_subspace_round(resid, seed)
    got = {
        r["rid"]: list(r["rv"])
        for r in sim.ivfpq_residual_codebook_trained(
            load_table(spark, sf_dir, "embeddings")
        ).collect()
    }
    assert set(got) == set(want)
    for rid in want:
        assert all(_close(a, b) for a, b in zip(got[rid], want[rid])), rid


def test_ivfpq_trained_search_matches_python_reference(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_selection import q_ann_ivfpq_trained

    rows = _emb_rows()
    resid = _py_residuals(rows)
    seed = {rid: resid[rid + 16] for rid in range(16)}
    ref = _py_ivfpq(rows, rcb=_py_train_subspace_round(resid, seed))
    got: dict[int, list] = {}
    for r in q_ann_ivfpq_trained(spark, sf_dir).orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["adc"]))
    assert set(got) == set(ref)
    for q in ref:
        assert [v for v, _ in got[q]] == [v for v, _ in ref[q]], f"query {q}"
        for (_, a), (_, b) in zip(got[q], ref[q]):
            assert _close(a, b)  # trained centroids: see _q60 parity caveat


def test_trained_recall_bounds(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_selection import (
        q_ann_ivfpq_trained_recall,
        q_ann_pq_trained_recall,
    )

    for fn in (q_ann_pq_trained_recall, q_ann_ivfpq_trained_recall):
        rows = fn(spark, sf_dir).collect()
        assert len(rows) == 8
        for r in rows:
            assert 0.0 <= r["recall"] <= 1.0


# ---------------------------------------------------------------------------
# Trained coarse quantizer (r11): full-dim Lloyd round — python
# reference parity under both metrics, plus the persisted-PQ and
# occupancy contracts
# ---------------------------------------------------------------------------


def _py_train_fulldim_round(vecs, seed_cents, metric, dim=64):
    """One full-dimension Lloyd round (the operators/similarity
    ivf_centroids_trained semantics in pure Python): assignment under
    the index's metric (cos: max cosine, ties to smaller cid; l2: min
    squared distance, ties to smaller cid) with sequential-fold
    arithmetic matching the engine's codegen order, then exact
    2^60-scaled integer mean updates; empty clusters keep seeds."""

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    norms = {vid: math.sqrt(dot(v, v)) for vid, v in vecs.items()}
    cnorm = {cid: math.sqrt(dot(c, c)) for cid, c in seed_cents.items()}
    groups: dict[int, list] = {}
    for vid, v in sorted(vecs.items()):
        if metric == "cos":
            best = max(
                (dot(v, c) / (norms[vid] * cnorm[cid]), -cid)
                for cid, c in seed_cents.items()
            )
            cid = -best[1]
        else:
            cid = min((d2(v, c), cid) for cid, c in seed_cents.items())[1]
        groups.setdefault(cid, []).append(v)
    new = {cid: list(cv) for cid, cv in seed_cents.items()}
    for cid, members in groups.items():
        for j in range(dim):
            total = sum(_q60(m[j]) for m in members)
            new[cid][j] = float(total) / _POW2_60_F / len(members)
    return new


@pytest.mark.parametrize("metric", ["cos", "l2"])
def test_ivf_centroids_trained_matches_python_reference(spark, sf_dir, metric):
    rows = _emb_rows()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    seed = {cid: vecs[cid] for cid in range(16)}
    want = _py_train_fulldim_round(vecs, seed, metric)
    got = {
        r["cid"]: list(r["cv"])
        for r in sim.ivf_centroids_trained(
            load_table(spark, sf_dir, "embeddings"), metric=metric, spread=False
        ).collect()
    }
    assert set(got) == set(want)
    for cid in want:
        assert all(_close(a, b) for a, b in zip(got[cid], want[cid])), cid


def test_ivf_occupancy_contract(spark, sf_dir):
    """q_ann_ivf_occupancy publishes one row per quantizer variant;
    both variants assign the WHOLE corpus (n_vecs equal), and spread
    is exactly max/mean. The trained-vs-seeded spread DELTA is
    recorded in BASELINE.md as a measurement, not asserted — on a
    tiny fixture one Lloyd round need not strictly dominate."""
    from airflow_crypto_etl_spark.queries_selection import q_ann_ivf_occupancy

    rows = {r["variant"]: r for r in q_ann_ivf_occupancy(spark, sf_dir).collect()}
    assert set(rows) == {"seeded", "trained"}
    n = load_table(spark, sf_dir, "embeddings").count()
    for r in rows.values():
        assert r["n_vecs"] == n
        assert 1 <= r["n_lists"] <= 16
        assert r["max_occ"] >= r["min_occ"] >= 1
        assert _close(r["spread"], r["max_occ"] * r["n_lists"] / r["n_vecs"])


def test_trained_coarse_recall_bounds(spark, sf_dir):
    from airflow_crypto_etl_spark.queries_selection import (
        q_ann_ivf_trained_recall,
        q_ann_ivfpq_coarse_trained_recall,
    )

    for fn in (q_ann_ivf_trained_recall, q_ann_ivfpq_coarse_trained_recall):
        rows = fn(spark, sf_dir).collect()
        assert len(rows) == 8
        for r in rows:
            assert 0.0 <= r["recall"] <= 1.0


def test_pq_index_roundtrip_matches_pq_topk(spark, sf_dir, tmp_path):
    """pq_index_build → parquet → pq_index_lookup on in-corpus queries
    must return byte-identical rows to the rebuild-per-call pq_topk
    with the same trained codebook: the index columns are plain
    double/bigint, so persistence cannot perturb a single rank or ADC
    score."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codebook, codes = sim.pq_index_build(emb, trained=True)
    codebook.write.parquet(str(tmp_path / "codebook"))
    codes.write.parquet(str(tmp_path / "codes"))
    cb_p = spark.read.parquet(str(tmp_path / "codebook"))
    codes_p = spark.read.parquet(str(tmp_path / "codes"))
    ids = [0, 1, 2, 3, 4, 5, 6, 7]
    batch = emb.filter(F.col("vec_id").isin(ids))
    persisted = sim.pq_index_lookup(batch, cb_p, codes_p, k=10)
    rebuilt = sim.pq_topk(
        emb, ids, k=10, codebook=sim.pq_codebook_trained(emb)
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = sorted(persisted.collect(), key=key)
    want = sorted(rebuilt.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 80


def test_pq_index_stats_counts_degenerate_rows(spark, sf_dir):
    """r11 ADVICE item 3: rows whose codes array is NULL or empty must
    still count in n_vecs (the pre-single-pass codes-table count
    semantics) instead of being dropped by posexplode."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _cb, codes = sim.pq_index_build(emb.filter(F.col("vec_id") < 50), trained=False)
    degenerate = codes.sparkSession.createDataFrame(
        [(100001, None), (100002, [])], "vec_id bigint, codes array<bigint>"
    )
    healthy = codes.count()
    row = sim.pq_index_stats(codes.unionByName(degenerate)).collect()[0]
    assert row["n_vecs"] == healthy + 2


def test_book_literal_gate_rejects_empty_and_nonfinite():
    """r11 ADVICE item 1: the literal-book plan form must fall back to
    the typed broadcast relation for empty seed sets (array() types as
    array<string>) and for non-finite doubles (repr text the SQL
    parser rejects)."""
    assert sim._book_literal_ok([(0, [1.0, 2.0]), (1, [3.0, 4.0])])
    assert not sim._book_literal_ok([])
    assert not sim._book_literal_ok([(0, [float("nan"), 1.0])])
    assert not sim._book_literal_ok([(0, [1.0]), (1, [float("inf")])])
    assert not sim._book_literal_ok([(0, [1.0, 2.0], float("nan"))])
    assert not sim._book_literal_ok([(0, [0.0] * 5000)])


def test_pq_index_build_codes_equal_append(spark, sf_dir):
    """The build-IS-append invariant as a TEST (r11 verdict item 6):
    pq_index_build encodes the corpus directly under its 1-row book
    (skipping pq_index_append's explode→repack of the same book), so
    this pins that the build's codes are row-identical to
    pq_index_append applied to the whole corpus against the build's
    exploded (cid, cv) codebook — for both the seeded and the trained
    book."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    for trained in (False, True):
        codebook, codes = sim.pq_index_build(emb, trained=trained)
        via_append = sim.pq_index_append(emb, codebook)
        got = sorted(
            (r["vec_id"], tuple(r["codes"])) for r in codes.collect()
        )
        want = sorted(
            (r["vec_id"], tuple(r["codes"])) for r in via_append.collect()
        )
        assert got == want and len(got) > 0


def test_pq_index_append_equals_rebuild_and_replay_noop(spark, sf_dir, tmp_path):
    """The growing-PQ-index contract (q_ann_pq_index_append's live
    twin): lookup against base + two appended batch_id partitions is
    row-identical to a rebuild over the union corpus with the same
    frozen codebook, and REPLAYING an appended batch (dynamic
    partition overwrite of its own batch_id) leaves the codes table's
    row set unchanged."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(~(F.col("vec_id") % 10).isin([7, 8]))
    codebook, codes0 = sim.pq_index_build(base, trained=False)
    codebook.write.parquet(str(tmp_path / "codebook"))
    cb_p = spark.read.parquet(str(tmp_path / "codebook"))
    codes_dir = str(tmp_path / "codes")

    def write_batch(rows, b):
        (
            rows.withColumn("batch_id", F.lit(b))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(codes_dir)
        )

    write_batch(codes0, 0)
    slices = [emb.filter(F.col("vec_id") % 10 == r) for r in (7, 8)]
    for b, sl in enumerate(slices, start=1):
        write_batch(sim.pq_index_append(sl, cb_p), b)
    grown = spark.read.parquet(codes_dir).select("vec_id", "codes")
    ids = [0, 1, 2, 3]
    batch = emb.filter(F.col("vec_id").isin(ids))
    appended = sim.pq_index_lookup(batch, cb_p, grown, k=10)
    # rebuild over the UNION corpus with the SAME frozen book (the
    # append contract: the codebook is versioned with the index, so a
    # rebuild re-encodes everything against it rather than re-seeding)
    codes_union = sim.pq_index_append(emb, cb_p)
    rebuilt = sim.pq_index_lookup(batch, cb_p, codes_union, k=10)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got = sorted(appended.collect(), key=key)
    want = sorted(rebuilt.collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 40
    # replayed batch is a no-op on the stored row set
    before = sorted(
        tuple(r) for r in spark.read.parquet(codes_dir).select("vec_id", "codes").collect()
    )
    write_batch(sim.pq_index_append(slices[0], cb_p), 1)
    after = sorted(
        tuple(r) for r in spark.read.parquet(codes_dir).select("vec_id", "codes").collect()
    )
    assert before == after


def test_ivf_index_compact_is_pure_relayout(spark, sf_dir, tmp_path):
    """ivf_index_compact consumes batch_id and preserves the exact
    (cid, vec_id) row multiset of the grown table, and lookup against
    the compacted index is row-identical to lookup against the grown
    one — compaction is pure re-layout (the small-file maintenance
    half of the append contract)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(~(F.col("vec_id") % 10).isin([3, 4]))
    cents, assign0 = sim.ivf_index_build(base, n_centroids=16, spread=False)
    cents.write.parquet(str(tmp_path / "centroids"))
    cents_p = spark.read.parquet(str(tmp_path / "centroids"))
    assign_dir = str(tmp_path / "assign")
    for b, rows in enumerate(
        [assign0]
        + [
            sim.ivf_index_append(
                emb.filter(F.col("vec_id") % 10 == r), cents_p, spread=False
            )
            for r in (3, 4)
        ]
    ):
        (
            rows.withColumn("batch_id", F.lit(b))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(assign_dir)
        )
    grown = spark.read.parquet(assign_dir)
    sim.ivf_index_compact(grown).write.parquet(str(tmp_path / "compacted"))
    compacted = spark.read.parquet(str(tmp_path / "compacted"))
    assert set(compacted.columns) == {"cid", "vec_id"}
    grown_rows = sorted((r["cid"], r["vec_id"]) for r in grown.collect())
    comp_rows = sorted((r["cid"], r["vec_id"]) for r in compacted.collect())
    assert grown_rows == comp_rows
    batch = emb.filter(F.col("vec_id") % 10 == 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    via_grown = sorted(
        sim.ivf_index_lookup(
            batch, emb, cents_p, grown.select("cid", "vec_id"), k=10, spread=False
        ).collect(),
        key=key,
    )
    via_comp = sorted(
        sim.ivf_index_lookup(batch, emb, cents_p, compacted, k=10, spread=False).collect(),
        key=key,
    )
    assert [tuple(r) for r in via_grown] == [tuple(r) for r in via_comp]
    assert len(via_comp) > 0


def test_ivf_index_stats_arithmetic(spark, sf_dir, tmp_path):
    """ivf_index_stats recomputes exactly: n_vecs = corpus size,
    appended_vecs = the appended slices' row count, n_append_batches =
    batches beyond base, spread = max*lists/vecs; and a table WITHOUT
    batch_id (a compacted base) reports zero append bookkeeping."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(~(F.col("vec_id") % 10).isin([6, 9]))
    cents, assign0 = sim.ivf_index_build(base, n_centroids=16, spread=False)
    cents.write.parquet(str(tmp_path / "centroids"))
    cents_p = spark.read.parquet(str(tmp_path / "centroids"))
    assign_dir = str(tmp_path / "assign")
    for b, rows in enumerate(
        [assign0]
        + [
            sim.ivf_index_append(
                emb.filter(F.col("vec_id") % 10 == r), cents_p, spread=False
            )
            for r in (6, 9)
        ]
    ):
        (
            rows.withColumn("batch_id", F.lit(b))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(assign_dir)
        )
    grown = spark.read.parquet(assign_dir)
    n = emb.count()
    napp = emb.filter((F.col("vec_id") % 10).isin([6, 9])).count()
    cap = (2 * n) // 16
    row = sim.ivf_index_stats(grown, list_cap=cap).collect()[0]
    assert row["n_vecs"] == n
    assert row["appended_vecs"] == napp
    assert row["n_append_batches"] == 2
    assert math.isclose(row["appended_frac"], napp / n, rel_tol=1e-12)
    assert math.isclose(
        row["spread"], row["max_occ"] * row["n_lists"] / row["n_vecs"], rel_tol=1e-12
    )
    assert row["n_lists_over_cap"] == 0 and 1 <= row["n_lists"] <= 16
    # compacted (no batch_id) → zero append bookkeeping, same list stats
    comp = sim.ivf_index_stats(sim.ivf_index_compact(grown), list_cap=cap).collect()[0]
    assert comp["n_append_batches"] == 0 and comp["appended_vecs"] == 0
    assert (comp["n_lists"], comp["n_vecs"], comp["max_occ"], comp["min_occ"]) == (
        row["n_lists"], row["n_vecs"], row["max_occ"], row["min_occ"]
    )


def test_ivf_index_retrain_equals_trained_rebuild(spark, sf_dir, tmp_path):
    """ivf_index_retrain publishes exactly the pair a trained rebuild
    over the same corpus produces (the retrain ACTION is the trained
    build, versioned); the parquet round-trip is bit-exact; and a
    lookup through the READ-BACK retrained pair is row-identical to
    the rebuild-per-call trained path (ivf_batch_lookup with trained
    centroids) — the persisted-trained edge of the lifecycle square."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    cap = (2 * n) // 16
    cents2, assign2 = sim.ivf_index_retrain(
        emb, n_centroids=16, list_cap=cap, spread=False
    )
    trained = sim.ivf_centroids_trained(emb, n_centroids=16, metric="cos", spread=False)
    cents_d, assign_d = sim.ivf_index_build(
        emb, n_centroids=16, list_cap=cap, spread=False, centroids=trained
    )
    assert sorted(map(tuple, cents2.collect())) == sorted(map(tuple, cents_d.collect()))
    assert sorted(map(tuple, assign2.collect())) == sorted(map(tuple, assign_d.collect()))
    cents2.write.parquet(str(tmp_path / "centroids_v2"))
    assign2.write.parquet(str(tmp_path / "assign_v2"))
    cents_p = spark.read.parquet(str(tmp_path / "centroids_v2"))
    assign_p = spark.read.parquet(str(tmp_path / "assign_v2"))
    # bit-exact round-trip: plain double/bigint columns
    assert sorted(map(tuple, cents_p.collect())) == sorted(map(tuple, cents2.collect()))
    batch = emb.filter(F.col("vec_id") % 10 == 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    via_persisted = sorted(
        sim.ivf_index_lookup(batch, emb, cents_p, assign_p, k=10, spread=False).collect(),
        key=key,
    )
    via_rebuild = sorted(
        sim.ivf_batch_lookup(
            emb, batch, k=10, n_centroids=16, n_probe=4, list_cap=cap,
            spread=False, centroids=trained,
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in via_persisted] == [tuple(r) for r in via_rebuild]
    assert len(via_persisted) > 0


def test_pq_index_stats_arithmetic(spark, sf_dir):
    """pq_index_stats recomputes exactly against a Python reference
    over the collected codes: n_vecs, per-subspace code utilization
    (codes_used_min/max), the worst single-code concentration
    max_code_frac, and the batch_id append bookkeeping; a table
    WITHOUT batch_id reports zero append bookkeeping."""
    from collections import Counter

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(~(F.col("vec_id") % 10).isin([4, 7]))
    codebook, codes0 = sim.pq_index_build(base, trained=False)
    grown = codes0.withColumn("batch_id", F.lit(0))
    for b, r in enumerate((4, 7), start=1):
        grown = grown.unionByName(
            sim.pq_index_append(
                emb.filter(F.col("vec_id") % 10 == r), codebook
            ).withColumn("batch_id", F.lit(b))
        )
    row = sim.pq_index_stats(grown).collect()[0]
    codes = {r["vec_id"]: list(r["codes"]) for r in grown.collect()}
    n = emb.count()
    napp = emb.filter((F.col("vec_id") % 10).isin([4, 7])).count()
    assert row["n_vecs"] == n == len(codes)
    per = Counter((s, c) for cl in codes.values() for s, c in enumerate(cl))
    used = Counter(s for (s, _c) in per)
    assert row["n_sub"] == sim.PQ_SUB == len(used)
    assert row["codes_used_min"] == min(used.values())
    assert row["codes_used_max"] == max(used.values())
    assert math.isclose(row["max_code_frac"], max(per.values()) / n, rel_tol=1e-12)
    assert row["n_append_batches"] == 2
    assert row["appended_vecs"] == napp
    assert math.isclose(row["appended_frac"], napp / n, rel_tol=1e-12)
    bare = sim.pq_index_stats(grown.drop("batch_id")).collect()[0]
    assert bare["n_append_batches"] == 0 and bare["appended_vecs"] == 0
    assert (bare["n_vecs"], bare["codes_used_min"], bare["codes_used_max"]) == (
        row["n_vecs"], row["codes_used_min"], row["codes_used_max"]
    )


def test_pq_index_compact_is_pure_relayout(spark, sf_dir, tmp_path):
    """pq_index_compact consumes batch_id and preserves the exact
    (vec_id, codes) row multiset of the grown codes table, and ADC
    lookup against the compacted table is row-identical to lookup
    against the grown one — compaction is pure re-layout (the
    small-file maintenance half; no probe selectivity is claimed, per
    the operator docstring)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(~(F.col("vec_id") % 10).isin([6, 8]))
    codebook, codes0 = sim.pq_index_build(base, trained=False)
    codebook.write.parquet(str(tmp_path / "codebook"))
    cb_p = spark.read.parquet(str(tmp_path / "codebook"))
    codes_dir = str(tmp_path / "codes")
    for b, rows in enumerate(
        [codes0]
        + [
            sim.pq_index_append(emb.filter(F.col("vec_id") % 10 == r), cb_p)
            for r in (6, 8)
        ]
    ):
        (
            rows.withColumn("batch_id", F.lit(b))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(codes_dir)
        )
    grown = spark.read.parquet(codes_dir)
    sim.pq_index_compact(grown).write.parquet(str(tmp_path / "compacted"))
    compacted = spark.read.parquet(str(tmp_path / "compacted"))
    assert set(compacted.columns) == {"vec_id", "codes"}
    grown_rows = sorted((r["vec_id"], tuple(r["codes"])) for r in grown.collect())
    comp_rows = sorted((r["vec_id"], tuple(r["codes"])) for r in compacted.collect())
    assert grown_rows == comp_rows
    batch = emb.filter(F.col("vec_id") % 10 == 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    via_grown = sorted(
        sim.pq_index_lookup(
            batch, cb_p, grown.select("vec_id", "codes"), k=10
        ).collect(),
        key=key,
    )
    via_comp = sorted(
        sim.pq_index_lookup(batch, cb_p, compacted, k=10).collect(), key=key
    )
    assert [tuple(r) for r in via_grown] == [tuple(r) for r in via_comp]
    assert len(via_comp) > 0
