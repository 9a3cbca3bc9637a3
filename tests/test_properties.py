"""Property-based tests (hypothesis): algebraic laws the merge/dedup/
window operators must satisfy on arbitrary inputs — idempotence,
commutation with filtering, agreement between independent
implementations. (The reference has no tests at all — SURVEY.md §5 —
so these laws ARE the operator specifications.)"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_crypto_etl_spark.operators import upsert as upsert_ops
from airflow_crypto_etl_spark.operators import windows as win_ops

ROW = st.tuples(
    st.integers(min_value=0, max_value=5),  # key
    st.integers(min_value=0, max_value=1000),  # ts
    st.integers(min_value=-100, max_value=100),  # value
)
ROWS = st.lists(ROW, min_size=0, max_size=30)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows] or [], schema=SCHEMA)


def _unique_ts(rows):
    # make (k, ts) unique so winner selection is well-defined
    return [(k, 1000 * i + ts, v) for i, (k, ts, v) in enumerate(rows)]


@given(target=ROWS, updates=ROWS)
@_SETTINGS
def test_upsert_ignore_preserves_target_rows(spark, target, updates):
    target, updates = _unique_ts(target), _unique_ts(updates)
    t, u = _df(spark, target), _df(spark, updates)
    merged = {r["k"]: r for r in upsert_ops.upsert_ignore(
        win_ops.earliest_per_key(t, "k", "ts", "v"),
        win_ops.earliest_per_key(u, "k", "ts", "v"),
        keys=["k"], tiebreak="ts").collect()}
    t_keys = {r[0] for r in target}
    for k, row in merged.items():
        if k in t_keys:
            # first-writer-wins: a target key's row must come from target
            assert (row["k"], row["ts"], row["v"]) in {tuple(r) for r in target}


@given(target=ROWS, updates=ROWS)
@_SETTINGS
def test_upsert_update_is_idempotent(spark, target, updates):
    target, updates = _unique_ts(target), _unique_ts(updates)
    t = win_ops.earliest_per_key(_df(spark, target), "k", "ts", "v")
    u = win_ops.earliest_per_key(_df(spark, updates), "k", "ts", "v")
    once = upsert_ops.upsert_update(t, u, keys=["k"], tiebreak="ts")
    twice = upsert_ops.upsert_update(once, u, keys=["k"], tiebreak="ts")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@given(rows=ROWS)
@_SETTINGS
def test_latest_per_key_agrees_with_max_by(spark, rows):
    rows = _unique_ts(rows)
    df = _df(spark, rows)
    a = {
        (r["k"], r["ts"], r["v"])
        for r in win_ops.latest_per_key(df, "k", "ts", "v").collect()
    }
    b = {
        (r["k"], r["ts"], r["v"])
        for r in win_ops.latest_per_key_agg(df, "k", "ts", ["v"]).collect()
    }
    assert a == b


@given(rows=ROWS)
@_SETTINGS
def test_dedup_exact_keeps_one_per_key_deterministically(spark, rows):
    rows = _unique_ts(rows)
    df = _df(spark, rows)
    out = upsert_ops.dedup_exact(df, ["k"], order_col="ts").collect()
    assert len(out) == len({r[0] for r in rows})
    by_key = {}
    for k, ts, v in rows:
        if k not in by_key or ts < by_key[k][1]:
            by_key[k] = (k, ts, v)
    assert {tuple(r) for r in out} == set(by_key.values())


EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=11), st.integers(min_value=0, max_value=11)),
    min_size=0,
    max_size=20,
).map(lambda es: [(a, b) for a, b in es if a < b])


@given(edges=EDGES)
@_SETTINGS
def test_duplicate_clusters_invariants(spark, edges):
    """Connected-components laws on arbitrary graphs over 12 nodes:
    exactly one kept doc per cluster, cluster_id is the component's
    minimum, and every edge joins two same-cluster nodes (reference
    implementation: pure-python union-find)."""
    from airflow_crypto_etl_spark.operators import dedup as dd

    nodes = list(range(12))
    docs = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges] or [],
        "doc_a long, doc_b long, est_jaccard double",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["is_kept"]) for r in
           dd.duplicate_clusters(docs, pairs).collect()}

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    expect = {n: min(members) for root, members in comp.items() for n in members}

    assert {n: c for n, (c, _) in got.items()} == expect
    kept = [n for n, (c, k) in got.items() if k]
    assert sorted(kept) == sorted(set(expect.values()))


TEXTS = st.lists(
    st.text(alphabet="ab1 .'", min_size=0, max_size=40), min_size=1, max_size=8
)


@given(texts=TEXTS)
@_SETTINGS
def test_subword_chunking_is_lossless(spark, texts):
    """Concatenating a document's subword pieces reproduces exactly its
    regex runs concatenated — chunking never drops or invents chars."""
    import re

    from airflow_crypto_etl_spark.operators import text as tx

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: "".join(r["p"])
        for r in df.select("doc_id", tx.subword_tokens_col("text").alias("p")).collect()
    }
    for i, t in enumerate(texts):
        runs = "".join(re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]", t))
        assert got[i] == runs


# ---------------------------------------------------------------------------
# Round-2 operators: asof strategies, packing, PII scrub, LSH near-dup
# ---------------------------------------------------------------------------

TS_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _ts_df(spark, rows):
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    data = [(k, base + dt.timedelta(seconds=ts), v) for k, ts, v in rows]
    return spark.createDataFrame(data or [], schema=TS_SCHEMA)


@given(left=ROWS, right=ROWS)
@_SETTINGS
def test_asof_merge_equals_pairs(spark, left, right):
    """The cogrouped merge_asof path and the JVM pairs path are
    independent implementations of the same ASOF spec — they must agree
    on arbitrary inputs (ties excluded: right timestamps are made
    unique per key so 'latest right <= left' picks a unique row)."""
    from airflow_crypto_etl_spark.operators.joins import asof_join

    l = _ts_df(spark, _unique_ts(left)).withColumnRenamed("v", "lv")
    r = _ts_df(spark, _unique_ts(right)).withColumnRenamed("v", "rv")
    kw = dict(on="k", left_ts="ts", right_ts="ts", right_cols=["ts", "rv"])
    m = asof_join(l, r, strategy="merge", **kw)
    p = asof_join(l, r, strategy="pairs", **kw)
    key = lambda rows: sorted((x.k, x.ts, x.lv, x.r_ts, x.r_rv) for x in rows)
    assert key(m.collect()) == key(p.collect())


@given(rows=st.lists(st.tuples(st.integers(0, 200), st.integers(0, 40)), min_size=0, max_size=40))
@_SETTINGS
def test_pack_sequences_invariants(spark, rows):
    """Packing preserves every doc, never assigns a negative bin, and a
    bin's start offset (cum - n_tokens) always lies inside the bin."""
    from airflow_crypto_etl_spark.operators.llm_prep import pack_sequences

    uniq = {i: n for i, (i_raw, n) in enumerate(rows) for i in [i_raw + 1000 * i]}
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in uniq.items()] or [],
        "doc_id long, text string",
    )
    cap = 37
    out = pack_sequences(docs, capacity=cap, n_buckets=4).collect()
    assert len(out) == len(uniq)
    assert all(r.bin_seq >= 0 for r in out)
    # recompute the per-bucket running sums and check bin assignment
    per_bucket = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.doc_id)):
        cum = per_bucket.get(r.bucket, 0) + r.n_tokens
        per_bucket[r.bucket] = cum
        assert r.bin_seq == (cum - r.n_tokens) // cap


@given(text=st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\x00"), max_size=80))
@_SETTINGS
def test_scrub_pii_idempotent(spark, text):
    """Scrubbing an already-scrubbed document changes nothing (masks
    contain no maskable patterns)."""
    from airflow_crypto_etl_spark.operators.llm_prep import scrub_pii

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    once = scrub_pii(df).select(F.col("scrubbed").alias("text"), F.lit(1).alias("doc_id"))
    twice = scrub_pii(once).collect()[0]
    assert twice.scrubbed == twice.text
    assert twice.n_email == 0 and twice.n_ipv4 == 0


def test_lsh_near_pairs_subset_of_exact(spark, sf_dir):
    """Candidate filtering can only LOSE pairs (bounded recall), never
    invent them, and every emitted pair meets the threshold."""
    from airflow_crypto_etl_spark.operators import similarity as sim
    from airflow_crypto_etl_spark.queries_ext import EMB_DIM, _emb

    E = _emb(spark, sf_dir)
    exact = {(r.vec_a, r.vec_b) for r in sim.cosine_pairs(E, threshold=0.4).collect()}
    lsh = sim.lsh_near_pairs(E, threshold=0.4, dim=EMB_DIM).collect()
    assert {(r.vec_a, r.vec_b) for r in lsh} <= exact
    assert all(r.cos >= 0.4 for r in lsh)


# ---------------------------------------------------------------------------
# Market time-series operators vs an independent pandas reference
# ---------------------------------------------------------------------------

TICK = st.tuples(
    st.integers(min_value=0, max_value=2),     # symbol index
    st.integers(min_value=0, max_value=5000),  # minutes offset
    st.integers(min_value=1, max_value=10_000),  # price cents
)
TICKS = st.lists(TICK, min_size=1, max_size=40, unique=True)


def _market_df(spark, ticks):
    import datetime as dt

    from airflow_crypto_etl_spark.operators import timeseries as tso

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            f"s{si}",
            base + dt.timedelta(minutes=mins),
            i,
            cents / 100.0,
        )
        for i, (si, mins, cents) in enumerate(ticks)
    ]
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    ), tso


@given(ticks=TICKS)
@_SETTINGS
def test_ohlc_agrees_with_pandas_groupby(spark, ticks):
    import pandas as pd

    df, tso = _market_df(spark, ticks)
    got = {
        (r.symbol, r.bucket): r
        for r in tso.ohlc(tso.with_market_cols(df)).collect()
    }
    pdf = df.toPandas()
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    pdf["volume"] = pdf["event_id"] % 7 + 1
    ref_groups = pdf.sort_values(["ts", "event_id"]).groupby(["event_type", "bucket"])
    assert len(got) == len(ref_groups)
    for (sym, bucket), grp in ref_groups:
        r = got[(sym, bucket.to_pydatetime())]
        assert float(r.open) == grp["value"].iloc[0]
        assert float(r.close) == grp["value"].iloc[-1]
        assert float(r.high) == grp["value"].max()
        assert float(r.low) == grp["value"].min()
        assert r.volume == int(grp["volume"].sum())
        assert r.n_trades == len(grp)


@given(ticks=TICKS)
@_SETTINGS
def test_gapfill_spine_is_dense_and_anchored(spark, ticks):
    df, tso = _market_df(spark, ticks)
    closes = tso.hourly_close(tso.with_market_cols(df))
    out = tso.gapfill_linear(closes).toPandas()
    closes_pd = closes.toPandas()
    for sym, grp in out.groupby("symbol"):
        grp = grp.sort_values("bucket")
        # dense hourly spine
        deltas = grp["bucket"].diff().dropna()
        assert (deltas == deltas.iloc[0]).all() if len(deltas) else True
        # real observations pass through unchanged; no NULL px anywhere
        assert grp["px"].notna().all()
        real = closes_pd[closes_pd.symbol == sym]
        merged = grp.merge(real, on="bucket")
        assert (merged["px"] == merged["close"].astype(float)).all()
        # interpolated values stay inside the series' observed range
        lo, hi = float(real["close"].min()), float(real["close"].max())
        assert grp["px"].between(lo - 1e-9, hi + 1e-9).all()


_WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1, max_size=15
)
_MERGES = st.lists(
    st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")),
    min_size=0,
    max_size=3,
)


@given(words=_WORDS, merges=_MERGES)
@_SETTINGS
def test_bpe_merge_fold_matches_sequential_scanner(spark, words, merges):
    """The codegen'd greedy fold (operators/bpe.merge_pair_col) must
    agree with a sequential left-to-right scanner for ANY word and ANY
    merge sequence — including overlap traps like 'aaa' + (a,a) — and
    rejoining pieces must always reconstruct the word."""
    from airflow_crypto_etl_spark.operators import bpe

    def ref_apply(w: str, merges) -> list[str]:
        s = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    df = spark.createDataFrame([(w,) for w in words], "word string")
    syms = F.split("word", "")
    for a, b in merges:
        syms = bpe.merge_pair_col(syms, a, b)
    got = [(r["word"], r["pieces"]) for r in df.select("word", syms.alias("pieces")).collect()]
    for w, pieces in got:
        assert pieces == ref_apply(w, merges), (w, merges)
        assert "".join(pieces) == w
