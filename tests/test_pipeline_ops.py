"""Operator-level tests for the round-4 pipeline operators: CDC apply,
passage dedup, deterministic sampling, vocabulary/TF-IDF, and Z-order
layout (the physical-write side the oracle query can't see)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import cdc
from airflow_crypto_etl_spark.operators import dedup as dd
from airflow_crypto_etl_spark.operators import layout as lo
from airflow_crypto_etl_spark.operators import sampling as sp
from airflow_crypto_etl_spark.operators import text as tx

# ---------------------------------------------------------------------------
# CDC apply
# ---------------------------------------------------------------------------


def _snapshot(spark):
    base = spark.createDataFrame(
        [Row(k=i, val=f"base{i}") for i in (1, 2, 3, 4)]
    )
    feed = spark.createDataFrame(
        [
            Row(k=2, val="upd2", seq=1, op="U"),
            Row(k=3, val="x", seq=1, op="D"),
            # key 4: delete at seq 1 LOSES to the later re-insert at seq 2
            Row(k=4, val="x", seq=1, op="D"),
            Row(k=4, val="reborn4", seq=2, op="I"),
            Row(k=5, val="new5", seq=1, op="I"),
        ]
    ).withColumn("seq", F.col("seq").cast("bigint"))
    out = cdc.apply_changes(base, feed, key="k")
    return {r.k: (r.val, r.version) for r in out.collect()}


def test_cdc_apply_semantics(spark):
    snap = _snapshot(spark)
    assert snap == {
        1: ("base1", 0),   # untouched base row, version 0
        2: ("upd2", 1),    # update overrides base
        4: ("reborn4", 2), # later insert overrides earlier delete
        5: ("new5", 1),    # plain insert
    }                      # key 3 deleted


def test_cdc_apply_is_one_aggregate_no_window(spark):
    base = spark.createDataFrame([Row(k=1, val="a")])
    feed = spark.createDataFrame([Row(k=1, val="b", seq=1, op="U")]).withColumn(
        "seq", F.col("seq").cast("bigint")
    )
    plan = cdc.apply_changes(base, feed, key="k")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # max_by aggregate, not row_number
    assert plan.count("Exchange") <= 2  # one shuffle per union leg at most


# ---------------------------------------------------------------------------
# Passage dedup
# ---------------------------------------------------------------------------


def _passage(words: str, n: int = 8) -> str:
    toks = words.split()
    assert len(toks) == n
    return words


def test_passage_dedup_removes_repeats_keeps_first(spark):
    segA = " ".join(f"a{i}" for i in range(8))
    segB = " ".join(f"b{i}" for i in range(8))
    segC = " ".join(f"c{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"{segA} {segB}"),     # original
            Row(doc_id=1, text=f"{segA} {segC}"),     # repeats segA
            Row(doc_id=2, text=f"{segB} {segA}"),     # fully repeated
        ]
    )
    out = {r.doc_id: r for r in dd.passage_dedup(docs).collect()}
    assert (out[0].n_segments, out[0].n_kept, out[0].clean_text) == (2, 2, f"{segA} {segB}")
    assert (out[1].n_segments, out[1].n_kept, out[1].clean_text) == (2, 1, segC)
    assert (out[2].n_segments, out[2].n_kept, out[2].clean_text) == (2, 0, "")


def test_passage_dedup_short_tail_and_order(spark):
    # 12 tokens -> segments of 8 and 4; order preserved on reassembly
    text = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame([Row(doc_id=7, text=text)])
    (row,) = dd.passage_dedup(docs).collect()
    assert row.n_segments == 2 and row.n_kept == 2
    assert row.clean_text == text
    dd.release_caches()


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


def _strata(spark):
    rows = [Row(id=i, stratum=f"s{i % 3}") for i in range(120)]
    return spark.createDataFrame(rows)


def test_bottomk_exact_n_deterministic_and_nested(spark):
    df = _strata(spark)
    s10 = sp.sample_bottomk_stratified(df, "stratum", "id", 10)
    got = s10.groupBy("stratum").count().collect()
    assert {r.stratum: r["count"] for r in got} == {"s0": 10, "s1": 10, "s2": 10}
    ids10 = {r.id for r in s10.collect()}
    # deterministic: a second evaluation returns the same sample
    assert {r.id for r in sp.sample_bottomk_stratified(df, "stratum", "id", 10).collect()} == ids10
    # prefix property: the 5-sample is a subset of the 10-sample
    ids5 = {r.id for r in sp.sample_bottomk_stratified(df, "stratum", "id", 5).collect()}
    assert ids5 < ids10 and len(ids5) == 15
    # small stratum: returns all of it
    tiny = spark.createDataFrame([Row(id=1, stratum="t"), Row(id=2, stratum="t")])
    assert sp.sample_bottomk_stratified(tiny, "stratum", "id", 10).count() == 2


def test_sample_fraction_bounds_and_determinism(spark):
    df = _strata(spark)
    assert sp.sample_fraction(df, "id", 0.0).count() == 0
    assert sp.sample_fraction(df, "id", 1.0).count() == 120
    n = sp.sample_fraction(df, "id", 0.3).count()
    assert 0 < n < 120
    assert sp.sample_fraction(df, "id", 0.3).count() == n
    with pytest.raises(ValueError):
        sp.sample_fraction(df, "id", 1.5)
    with pytest.raises(ValueError):
        sp.sample_bottomk_stratified(df, "stratum", "id", 0)


# ---------------------------------------------------------------------------
# Vocabulary / TF-IDF
# ---------------------------------------------------------------------------


def test_vocab_and_tfidf_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="cat dog cat"),
            Row(doc_id=1, text="dog fish"),
            Row(doc_id=2, text="cat"),
        ]
    )
    vocab = {r.term: (r.n_occurrences, r.n_docs) for r in tx.vocab_topk(docs, k=10).collect()}
    assert vocab == {"cat": (3, 2), "dog": (2, 2), "fish": (1, 1)}

    tfidf = tx.tfidf_topk(docs, k=2).collect()
    per_doc = {}
    for r in tfidf:
        per_doc.setdefault(r.doc_id, []).append(r)
    for rows in per_doc.values():
        assert [r.term_rank for r in sorted(rows, key=lambda r: r.term_rank)] == list(
            range(1, len(rows) + 1)
        )
    # doc 1's most distinctive term is the corpus-rare "fish", not "dog"
    top1 = next(r for r in per_doc[1] if r.term_rank == 1)
    assert top1.term == "fish" and top1.df_term == 1


# ---------------------------------------------------------------------------
# Z-order layout: the physical write must yield per-file (a, b)
# envelopes far tighter than an un-clustered layout — that tightness is
# exactly what parquet min/max pruning consumes.
# ---------------------------------------------------------------------------


def test_zvalue_bit_interleave_known_values(spark):
    df = spark.range(1).select(
        F.expr(lo.zvalue_sql("3", "5")).alias("z"),          # 3=0b11, 5=0b101
        F.expr(lo.zvalue_sql("0", "0")).alias("z0"),
        F.expr(lo.zvalue_sql("65535", "65535")).alias("zmax"),
    )
    row = df.collect()[0]
    # interleave(a=11b into odd, b=101b into even): bits 0(b0=1),1(a0=1),
    # 2(b1=0),3(a1=1),4(b2=1) -> 0b11011 = 27
    assert row.z == 27
    assert row.z0 == 0
    assert row.zmax == (1 << 32) - 1


def _file_envelopes(path):
    areas, rows = [], []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        mins = {"a": None, "b": None}
        maxs = {"a": None, "b": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        if mins["a"] is not None:
            areas.append((maxs["a"] - mins["a"] + 1) * (maxs["b"] - mins["b"] + 1))
            rows.append(md.num_rows)
    return areas, rows


def test_zorder_layout_tightens_file_envelopes(spark, tmp_path):
    side = 64
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("a"), (F.col("id") / side).cast("bigint").alias("b")
    )
    z_path, r_path = str(tmp_path / "zord"), str(tmp_path / "rand")
    lo.zorder_layout(grid, "a", "b", num_files=16).write.mode("overwrite").parquet(z_path)
    # contrast layout: hash-partitioned (each file spans the full grid)
    grid.repartition(16).write.mode("overwrite").parquet(r_path)

    z_areas, z_rows = _file_envelopes(z_path)
    r_areas, _ = _file_envelopes(r_path)
    total = side * side
    # Z-order: every file's (a, b) bounding rectangle is a small patch;
    # hash layout: every file spans (almost) the whole grid.
    assert sum(z_rows) == total
    assert sum(z_areas) / len(z_areas) < 0.25 * total
    assert sum(r_areas) / len(r_areas) > 0.8 * total


def test_bottomk_twophase_matches_direct(spark):
    """The two-phase (sketch-thresholded) sampler must return EXACTLY
    the direct window's sample — including on skewed strata and strata
    smaller than n."""
    rows = (
        [Row(id=i, stratum="big") for i in range(500)]
        + [Row(id=1000 + i, stratum="mid") for i in range(40)]
        + [Row(id=2000 + i, stratum="tiny") for i in range(3)]
    )
    df = spark.createDataFrame(rows)
    direct = {
        (r.stratum, r.id, r.sample_rank)
        for r in sp.sample_bottomk_stratified(df, "stratum", "id", 8).collect()
    }
    twophase = {
        (r.stratum, r.id, r.sample_rank)
        for r in sp.sample_bottomk_twophase(df, "stratum", "id", 8).collect()
    }
    assert twophase == direct
    assert len({(s, r) for s, _, r in direct if s == "tiny"}) == 3


def test_bottomk_twophase_survives_tight_safety(spark):
    """With safety < 1 the sketch threshold deliberately undershoots:
    the fallback path must still deliver the exact sample."""
    df = spark.createDataFrame([Row(id=i, stratum=f"s{i % 2}") for i in range(200)])
    direct = {
        (r.stratum, r.id)
        for r in sp.sample_bottomk_stratified(df, "stratum", "id", 10).collect()
    }
    tight = {
        (r.stratum, r.id)
        for r in sp.sample_bottomk_twophase(df, "stratum", "id", 10, safety=0.1).collect()
    }
    assert tight == direct


def test_corpus_pipeline_composition(spark, sf_dir):
    """The composed corpus build: stage row-accounting is monotone
    non-increasing, survivors are unique ids, shard positions are
    per-shard permutations, and every survivor meets the quality bar."""
    from airflow_crypto_etl_spark.plans.corpus_pipeline import (
        build_training_corpus,
        stage_counts,
    )
    from airflow_crypto_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stages = build_training_corpus(docs, min_quality=0.3, n_shards=8)
    counts = stage_counts(stages)
    assert counts["scored"] == docs.count()
    assert counts["kept"] <= counts["scored"]
    assert counts["scrubbed"] == counts["kept"]  # scrub never drops rows
    assert counts["deduped"] <= counts["kept"]
    assert counts["final"] == counts["deduped"]
    rows = stages["final"].collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r["quality_score"] >= 0.3 for r in rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_snapshot_diff_roundtrip_law(spark):
    """apply_changes(old, snapshot_diff(old, new)) == new — the diff is
    the exact inverse of the apply; and unchanged keys emit nothing."""
    from airflow_crypto_etl_spark.operators import cdc

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),        # unchanged -> no feed row
         (2, 25.0, "B"),        # price changed -> U
         (4, None, "D2"),       # status changed, null price both sides -> U
         (5, 50.0, "E")],       # inserted -> I  (3 deleted -> D)
        "k long, price double, status string",
    )
    feed = cdc.snapshot_diff(old, new, key="k")
    ops = {r["k"]: r["op"] for r in feed.collect()}
    assert ops == {2: "U", 3: "D", 4: "U", 5: "I"}
    applied = cdc.apply_changes(old, feed, key="k").drop("version")
    got = {tuple(r) for r in applied.collect()}
    exp = {tuple(r) for r in new.collect()}
    assert got == exp
    # null-safe comparison: key 4 matched on payload including NULL price
    assert 1 not in ops


def test_corpus_shards_land_sorted_on_disk(spark, sf_dir, tmp_path):
    """The shard-writer path the shuffle_shards docstring promises:
    repartition by shard + sortWithinPartitions(pos) + partitionBy
    lands one directory per shard whose parquet ROW ORDER is the shard
    position order (a tokenizer consumer streams it sequentially)."""
    import glob

    import pyspark.sql.functions as F

    from airflow_crypto_etl_spark.operators import llm_prep as lp
    from airflow_crypto_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = lp.shuffle_shards(docs, n_shards=4)
    out = str(tmp_path / "shards")
    (
        shards.repartition(4, "shard")
        .sortWithinPartitions("pos")
        .write.partitionBy("shard")
        .parquet(out)
    )
    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 4
    total = 0
    for d in dirs:
        rows = spark.read.parquet(d).collect()  # preserves file row order per file
        poss = [r["pos"] for r in rows]
        assert poss == sorted(poss), f"shard dir {d} not in position order"
        assert poss == list(range(1, len(poss) + 1))
        total += len(poss)
    assert total == docs.count()
