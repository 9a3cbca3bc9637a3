"""Repeated-span dedup (suffix-array-style) and per-doc span coverage:
maximality of merged runs, min_span/df_cap bounds, interval-union
coverage; plus the perceptual image dHash (formula parity + identical
images hash identically)."""

from __future__ import annotations

from airflow_crypto_etl_spark.operators import dedup as dd
from airflow_crypto_etl_spark.operators import multimodal as mm

SHARED = " ".join(f"s{i}" for i in range(15))  # 15-token shared span


def _corpus(spark):
    rows = [
        (1, f"a1 a2 a3 {SHARED} z1 z2"),      # span at tokens 3..17
        (2, f"b1 {SHARED} y1 y2 y3 y4"),      # span at tokens 1..15
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),  # unrelated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repeated_span_maximal_run(spark):
    out = dd.repeated_spans(_corpus(spark), k=8, min_span=12, df_cap=50).collect()
    assert len(out) == 1
    r = out[0]
    # one MAXIMAL span — never split into the 8 constituent 8-gram hits
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.span_tokens == 15
    assert (r.start_a, r.start_b) == (3, 1)


def test_min_span_filters_short_matches(spark):
    # the 15-token span survives min_span=15 but not min_span=16
    assert dd.repeated_spans(_corpus(spark), k=8, min_span=15).count() == 1
    assert dd.repeated_spans(_corpus(spark), k=8, min_span=16).count() == 0


def test_df_cap_drops_hot_grams(spark):
    # the shared span appears in EVERY doc -> every anchor df = 3 > cap=2
    rows = [(i, f"x{i} {SHARED} w{i}") for i in range(3)]
    docs = rows and _corpus(spark).sparkSession.createDataFrame(
        rows, "doc_id long, text string"
    )
    assert dd.repeated_spans(docs, k=8, min_span=12, df_cap=2).count() == 0
    # with the cap lifted, all 3 pairs report the span
    assert dd.repeated_spans(docs, k=8, min_span=12, df_cap=50).count() == 3


def test_span_coverage_unions_overlaps(spark):
    # doc 1 shares one 15-token region with docs 2 AND 3 -> intervals
    # duplicate/overlap and must union, not double-count
    rows = [
        (1, f"a1 a2 a3 {SHARED} z1 z2"),
        (2, f"b1 {SHARED} y1 y2 y3 y4"),
        (3, f"{SHARED} q1 q2 q3 q4 q5"),
    ]
    docs = _corpus(spark).sparkSession.createDataFrame(
        rows, "doc_id long, text string"
    )
    cov = {r.doc_id: r for r in dd.span_coverage(docs, k=8, min_span=12).collect()}
    assert cov[1].covered_tokens == 15  # unioned, not 30
    assert cov[1].n_tokens == 20
    assert abs(cov[1].coverage - 15 / 20) < 1e-12
    assert cov[2].covered_tokens == 15 and cov[3].covered_tokens == 15


def test_span_coverage_tie_heavy_duplicate_intervals(spark):
    # The round-6 nondeterminism corpus shape: doc 0 shares the IDENTICAL
    # span (same start, same length) with N partners, so before dedup
    # the sweep sees N exact-duplicate intervals tying under ORDER BY
    # (s, e). A tie-order disagreement between the island-open flag and
    # the island running sum would open a phantom island and double the
    # coverage (the 78-vs-156 DuckDB flip). After dropDuplicates the
    # order is total; coverage must be exactly the one span, for every N.
    for n_partners in (2, 5, 9):
        rows = [(0, f"h1 h2 h3 {SHARED} t1 t2")] + [
            (i, f"p{i}a p{i}b {SHARED} p{i}c") for i in range(1, n_partners + 1)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cov = {
            r.doc_id: r for r in dd.span_coverage(docs, k=8, min_span=12).collect()
        }
        assert cov[0].covered_tokens == 15, (n_partners, cov[0])
        assert cov[0].n_tokens == 20
        for i in range(1, n_partners + 1):
            assert cov[i].covered_tokens == 15  # shared span + partner pairs


def test_pair_join_fanout_bounded_by_df_cap(spark):
    # The anchors self-join's per-anchor fan-out is C(df, 2); df_cap is
    # the bound that keeps a boilerplate gram from exploding the join
    # quadratically at corpus scale. With D identical docs: D <= df_cap
    # emits exactly C(D, 2) pair spans (every pair, one maximal span);
    # D > df_cap emits ZERO (the hot anchors are dropped wholesale).
    text = " ".join(f"tok{j}" for j in range(30))
    for d, cap, expect in ((10, 50, 45), (10, 10, 45), (12, 11, 0)):
        docs = spark.createDataFrame(
            [(i, text) for i in range(d)], "doc_id long, text string"
        )
        got = dd.repeated_spans(docs, k=8, min_span=12, df_cap=cap).count()
        assert got == expect, (d, cap, got)


def _ref_dhash(d: int) -> int:
    w, h = 4 + d % 5, 3 + d % 4
    px = bytes((d + i) % 256 for i in range(w * h * 3))

    def s(x, y):
        p = 3 * (y * w + x)
        return px[p] + px[p + 1] + px[p + 2]

    xs = [(i * w) // 5 for i in range(5)]
    ys = [(j * h) // 4 for j in range(4)]
    bits = []
    for j in range(4):
        for i in range(4):
            bits.append(1 if s(xs[i + 1], ys[j]) > s(xs[i], ys[j]) else 0)
    for j in range(3):
        for i in range(5):
            bits.append(1 if s(xs[i], ys[j + 1]) > s(xs[i], ys[j]) else 0)
    ph = 0
    for b in bits:
        ph = ph * 2 + b
    return ph


def test_image_dhash_matches_generator_formula(spark):
    ids = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    hashed = mm.image_dhash(mm.attach_ppm_payload(ids))
    got = {r.doc_id: r.phash for r in hashed.collect()}
    assert got == {d: _ref_dhash(d) for d in range(12)}


def test_image_dhash_identical_images_collide(spark):
    # doc ids congruent mod lcm(256, 20) = 1280 get byte-identical
    # images, hence identical hashes
    ids = spark.createDataFrame([(7,), (7 + 1280,)], "doc_id long")
    hashes = [
        r.phash for r in mm.image_dhash(mm.attach_ppm_payload(ids)).collect()
    ]
    assert hashes[0] == hashes[1]


def test_spans_lookup_finds_full_twin(spark):
    corpus = _corpus(spark)
    index = dd.gram_hash_positions(corpus, k=8)
    # batch re-ingests doc 1 under a new id
    batch = corpus.where("doc_id = 1").selectExpr("doc_id + 100 AS doc_id", "text")
    out = dd.repeated_spans_lookup(batch, index, k=8, min_span=12).collect()
    by_pair = {(r.new_id, r.corpus_id): r for r in out}
    # the twin match covers the WHOLE doc (20 tokens), from position 0
    twin = by_pair[(101, 1)]
    assert twin.span_tokens == 20
    assert (twin.start_new, twin.start_corpus) == (0, 0)
    # and the batch doc also matches doc 2 on the 15-token shared span
    cross = by_pair[(101, 2)]
    assert cross.span_tokens == 15
    assert (cross.start_new, cross.start_corpus) == (3, 1)
    assert set(by_pair) == {(101, 1), (101, 2)}


def test_spans_lookup_df_cap_bounds_hot_grams(spark):
    # every corpus doc contains the same 15-token span: with df_cap=2
    # the index drops those postings entirely, so a batch doc matching
    # ONLY via the hot span finds nothing
    rows = [(i, f"x{i} {SHARED} w{i}") for i in range(3)]
    corpus = _corpus(spark).sparkSession.createDataFrame(
        rows, "doc_id long, text string"
    )
    index = dd.gram_hash_positions(corpus, k=8)
    batch = corpus.sparkSession.createDataFrame(
        [(100, f"q1 {SHARED} q2")], "doc_id long, text string"
    )
    assert dd.repeated_spans_lookup(batch, index, k=8, min_span=12, df_cap=2).count() == 0
    assert dd.repeated_spans_lookup(batch, index, k=8, min_span=12, df_cap=50).count() == 3


def _ppm_bytes(px: list[int], w: int, h: int) -> bytes:
    return f"P6\n{w} {h}\n255\n".encode() + bytes(px)


def test_image_dhash_is_perceptual(spark):
    """Brightness shift (+15) and exact contrast doubling (x2, no
    clamp, no rounding) preserve the ORDER of every pair of grayscale
    sums, so the difference hash must be invariant — the property that
    makes it a near-dup detector rather than a checksum. (Pixels stay
    in [40, 120] so neither transform wraps or clamps.)"""
    import random

    rows = []
    rng = random.Random(42)
    for i in range(5):
        w, h = rng.randint(4, 9), rng.randint(4, 8)
        px = [rng.randint(40, 120) for _ in range(w * h * 3)]
        rows.append((i * 10 + 0, _ppm_bytes(px, w, h)))
        rows.append((i * 10 + 1, _ppm_bytes([p + 15 for p in px], w, h)))
        rows.append((i * 10 + 2, _ppm_bytes([p * 2 for p in px], w, h)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.phash for r in mm.image_dhash(df).collect()}
    for i in range(5):
        base = got[i * 10]
        assert got[i * 10 + 1] == base, "brightness shift changed the hash"
        assert got[i * 10 + 2] == base, "contrast scale changed the hash"


# ---------------------------------------------------------------------------
# Property: repeated_spans == brute-force maximal common token runs
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DOC = st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=30)
_CORPUS = st.lists(_DOC, min_size=2, max_size=5)


def _ref_spans(docs: dict, k: int, min_span: int, df_cap: int):
    """Brute-force reference: df-capped k-gram anchors, grouped into
    consecutive runs per (pair, diagonal) — the operator's contract."""
    posts: dict = {}
    for i, toks in docs.items():
        for p in range(len(toks) - k + 1):
            posts.setdefault(tuple(toks[p : p + k]), []).append((i, p))
    anchors = {g: ps for g, ps in posts.items() if 2 <= len(ps) <= df_cap}
    by_diag: dict = {}
    for ps in anchors.values():
        for ai, ap in ps:
            for bi, bp in ps:
                if ai < bi:
                    by_diag.setdefault((ai, bi, ap - bp), []).append(ap)
    out = set()
    for (a, b, diag), positions in by_diag.items():
        positions = sorted(set(positions))
        run_start = positions[0]
        prev = positions[0]
        for p in positions[1:] + [None]:
            if p is None or p != prev + 1:
                span = prev - run_start + k
                if span >= min_span:
                    out.add((a, b, run_start, run_start - diag, span))
                if p is not None:
                    run_start = p
            prev = p if p is not None else prev
    return out


@given(corpus=_CORPUS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_repeated_spans_matches_bruteforce(spark, corpus):
    docs = {i: toks for i, toks in enumerate(corpus)}
    rows = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in dd.repeated_spans(df, k=8, min_span=10, df_cap=50).collect()
    }
    assert got == _ref_spans(docs, k=8, min_span=10, df_cap=50)


def test_video_phash_matches_generator_formula(spark):
    """Frame f of doc d is the constant-block JPEG seeded d + 97f:
    recompute every frame's dHash from that formula and fold in frame
    order — any frame mis-order, dropped frame, or decode drift in the
    operator chain (RIFF walk -> JPEG kernel -> grid hash -> fold)
    breaks equality."""
    CHAR_MOD = 1 << 30

    def frame_hash(seed, w, h):
        def s(x, y):
            return 2 * (((seed) * 7 + (y // 8) * 5 + (x // 8) * 3) % 128)

        xs = [(i * w) // 5 for i in range(5)]
        ys = [(j * h) // 4 for j in range(4)]
        bits = []
        for j in range(4):
            for i in range(4):
                bits.append(1 if s(xs[i + 1], ys[j]) > s(xs[i], ys[j]) else 0)
        for j in range(3):
            for i in range(5):
                bits.append(1 if s(xs[i], ys[j + 1]) > s(xs[i], ys[j]) else 0)
        ph = 0
        for b in bits:
            ph = ph * 2 + b
        return ph

    def ref(d):
        n = 2 + d % 4
        w, h = 8 * (1 + d % 3), 8 * (1 + d % 2)
        vh = 0
        for f in range(n):
            vh = (vh * 31 + frame_hash(d + 97 * f, w, h)) % CHAR_MOD
        return n, vh

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    got = {
        r.doc_id: (r.n_frames, r.vhash)
        for r in mm.video_phash(mm.attach_avi_payload(ids)).collect()
    }
    assert got == {d: ref(d) for d in range(8)}
