#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each slot is reported as the MEDIAN of $SPARK_GRAFT_BENCH_REPS (default
3) timed runs after a warm-up pass — single-run numbers on this box
jitter ±30% (round-1 verdict: q_rollup_hierarchy read 1.83× baseline on
one run, steady-state in the next), and medians keep a one-off GC/JIT
stall from masquerading as a regression. Timing covers the full action
(plan + execute + collect-to-count).

Round-12 measurement fixes (r11 verdict items 4 and 5; additions only,
documented in OPTIMIZATION_r12.md):

- ``dedup.release_caches()`` runs between timed trials, so the
  session-scoped signature/corpus caches built INSIDE trial 1 no longer
  make trials 2..n warm — every trial now pays the full cold cost and
  the median means one thing (previously q_dedup_index_compact's median
  was a warm-cache number while its first trial was cold).
- ``queries_noop`` is a NEW column timing the same queries through the
  noop sink (guide §1.4 — count() lets the optimizer prune columns and
  under-times wide-output queries; the noop sink computes every column
  of every row). The legacy count-timed ``queries`` / ``value`` columns
  are kept unchanged for round-over-round comparability; narratives
  should read ``queries_noop``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airflow_crypto_etl_spark.session import get_spark

import __spark_entry__ as entry

# The driver-facing registry itself (collision-checked by _merge_unique
# inside, finalize_decimals applied) — benching anything other than the
# exact callables the driver runs would be benching the wrong code.
ALL_QUERIES = entry.queries()

HEADLINE = [
    # reference-parity core
    "q_gold_daily",
    "q_daily_by_date",
    "q_star_join",
    "q_topk",
    "q_latest_per_key",
    "q_moving_avg",
    "q_filter_range",
    "q_json_extract",
    "q_upsert_update",
    # training-data extensions
    "q_token_count",
    "q_dedup_minhash",
    "q_ann_topk",
    "q_ann_ivf",
    "q_session_window",
    "q_stream_tumbling",
    # TPC-H analytic battery (join/agg heavy hitters)
    "q_tpch_q1",
    "q_tpch_q2",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q18",
    "q_tpch_q21",
    # market time-series battery (the reference's domain): candles,
    # gap-fill, and the window-heavy indicator family (r4 verdict #7)
    "q_ohlc_candles",
    "q_gapfill_interp",
    "q_macd",
    "q_corr_pairs",
    "q_backtest_sma",
    # warehouse modeling / streaming join
    "q_scd2_intervals",
    "q_stream_stream_join",
    "q_rollup_hierarchy",
    # round-5 additions: clustering / graph / codec families
    "q_kmeans",
    "q_pagerank",
    "q_multimodal_jpeg",
    # corpus-quality battery representative (three partial-agg passes
    # over the bigram stream + probability join)
    "q_lm_score",
    # video: container walk + multi-frame JPEG decode per payload
    "q_multimodal_video",
    # experimentation battery representatives: the 64-register sketch
    # (pure partial-agg), BM25 (tokenize + broadcast-df scoring), and
    # the 200-replicate Poisson bootstrap (users x R fan-out)
    "q_hll_distinct",
    "q_bm25",
    "q_bootstrap_ci",
    # round-6 additions: closed-form linear models (one-shuffle Gram
    # sums + Cramer epilogue), its streaming incremental twin, the Holt
    # FIR, and the RANGE-window attribution pass
    "q_ridge_regression",
    "q_stream_gram",
    "q_holt",
    "q_attribution",
    # round-6 late additions: substring dedup (posting build + anchor
    # join + diagonal islands) and the decoded-pixel perceptual hash
    "q_dedup_spans",
    "q_image_dedup_phash",
    # round-9 selection battery: DSIR bucket-ratio scoring, PQ/ADC
    # search (map-only encode + broadcast LUT), and the zero-shuffle
    # winnowing fingerprint pass
    "q_dsir",
    "q_ann_pq",
    "q_winnowing",
    # round-9 corpus-analytics battery representatives: the provenance
    # matrix (MinHash pair join + bounded source² agg) and the coverage
    # curve (two vocab shuffles + per-k TakeOrdered heaps)
    "q_source_overlap",
    "q_token_coverage",
    # round-10 additions: the persisted-index ingest path (build +
    # parquet round-trip + batch-only assignment + list equi-join) and
    # the per-day corpus-drift JSD rollup (bounded-cell aggregate)
    "q_ann_index_lookup",
    "q_corpus_drift",
    # round-11 additions: the GROWING index (base build + 2 appends +
    # capped lookup through the grown table) and the persisted PQ
    # index (trained codebook + corpus encode + parquet round-trip +
    # batch-only ADC lookup)
    "q_ann_index_append",
    "q_ann_pq_index_lookup",
    # round-11 late additions: the retrain maintenance action (trained
    # coarse quantizer + rebuild + versioned parquet publish + lookup
    # through the read-back pair) and the dedup-index maintenance
    # cycle (base build + 2 appends + both-table compaction + lookup
    # through the compacted pair)
    "q_ann_index_retrain",
    "q_dedup_index_compact",
]


def _calibrate() -> float:
    """Fixed-work, Spark-free CPU spin: the same deterministic integer
    workload every run, timed (median of 3), so a bench artifact
    carries the box's speed THAT DAY and committed composites can be
    deflated against VM noise instead of re-adjudicated with min-of-N
    reruns each round (r8 verdict recommendation — three rounds of
    bench adjudication went to noise-window forensics). ~1 s on an
    idle core; excluded from the headline total."""
    import statistics as _st

    def spin() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(12_000_000):
            acc = (acc + i * i) % 1_000_000_007
        assert acc >= 0
        return time.perf_counter() - t0

    return round(_st.median(spin() for _ in range(3)), 4)


def _io_calibrate(spark, sf_dir: str) -> float:
    """Fixed-work parquet-scan probe (r10 verdict item: the cpu spin
    cannot see I/O noise — one sf1 window had scan slots 3-10× slower
    at BETTER cpu calibration, costing nine full re-runs): median of 3
    single-column sums over the run's own lineitem file. A slow value
    with a clean cpu calibration_s marks a noisy-I/O window — re-run
    and compose per-slot MIN instead of reading slot ratios as
    regressions (adjudication rule recorded in BASELINE.md)."""
    import statistics as _st

    from pyspark.sql import functions as F

    def scan() -> float:
        t0 = time.perf_counter()
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).agg(
            F.sum("l_extendedprice")
        ).collect()
        return time.perf_counter() - t0

    return round(_st.median(scan() for _ in range(3)), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="aces-bench")

    # Warm the JVM/session (JIT, codegen compiler, parquet footer cache)
    # with generic scans/aggregates so measured queries reflect
    # steady-state throughput rather than first-query startup cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    from airflow_crypto_etl_spark.sources.tables import load_table

    load_table(spark, sf_dir, "lineitem").groupBy("l_linestatus").count().collect()
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o.join(c, o.o_custkey == c.c_custkey).count()

    # Per-query warm-up at the smallest SF: compiles the plan and JITs
    # the generated code so the timed sf0.1 run measures steady-state
    # EXECUTION (what a resident cluster sees), not first-compile —
    # codegen/JIT jitter was ±30% of the cold numbers on this box.
    warm_dir = "/root/testdata/sf0.001"
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    # First-trial wall is recorded SEPARATELY (queries_first): the r6
    # driver-context run inflated uniformly vs the r5 record, largest in
    # sub-second slots — per-query fixed overhead (fresh plan cache /
    # cold page cache on the driver VM), not plan regressions. Splitting
    # the columns makes that overhead visible instead of letting it mask
    # real regressions at exactly the slot sizes the suite has most of.
    first_run: dict[str, float] = {}
    noop_timings: dict[str, float] = {}
    # Session-scoped caches (dedup/similarity register_cache) are built
    # INSIDE a timed trial; releasing them between trials keeps every
    # trial cold so the median is a cold-cost median (r11 verdict item
    # 4 — previously trials 2..n reused trial 1's materialized caches).
    from airflow_crypto_etl_spark.operators.dedup import release_caches

    for name in HEADLINE:
        fn = ALL_QUERIES.get(name)
        if fn is None:
            continue
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass  # warm-up is best-effort; the timed run decides
        trials = []
        for _ in range(reps):
            release_caches()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            trials.append(time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(statistics.median(trials), 4)
        first_run[name] = round(trials[0], 4)
        # noop-sink twin (r11 verdict item 5 / guide §1.4): same plan,
        # same reps, but the timed action computes EVERY column of
        # every row and discards it — no column pruning, no sink cost.
        noop_trials = []
        for _ in range(reps):
            release_caches()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_trials.append(time.perf_counter() - t0)
        noop_timings[name] = round(statistics.median(noop_trials), 4)
        release_caches()

    # Write-path slots (BASELINE.md): silver-shaped transform throughput
    # and a dynamically-overwritten partitioned write.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.operators import transform as tf
    from airflow_crypto_etl_spark.sinks import writers

    li = load_table(spark, sf_dir, "lineitem")
    silver_shaped = tf.cast_columns(
        tf.rename(
            tf.project(li, ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"]),
            {"l_orderkey": "key", "l_extendedprice": "price", "l_shipdate": "ts"},
        ),
        {"l_quantity": "double"},
    )
    trials = []
    n_rows = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        n_rows = tf.enforce_contract(silver_shaped, not_null=["key", "ts"], positive=["price"]).count()
        trials.append(time.perf_counter() - t0)
    timings["silver_transform"] = round(statistics.median(trials), 4)

    trials = []
    for _ in range(reps):
        out_dir = tempfile.mkdtemp(prefix="aces_bench_write_")
        t0 = time.perf_counter()
        writers.write_partitioned(
            silver_shaped.withColumn("yr", F.year("ts")), out_dir, ["yr"]
        )
        trials.append(time.perf_counter() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    timings["partitioned_write"] = round(statistics.median(trials), 4)
    assert n_rows > 0
    total = round(sum(timings.values()), 4)
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_first": first_run,
        "queries_noop": noop_timings,
        "reps": reps,
        # box-speed witness: fixed single-core work, measured this run
        # (see _calibrate); divide composites by (calibration_s /
        # CALIBRATION_REF_S from BASELINE.md) to deflate VM noise
        "calibration_s": _calibrate(),
        # I/O-side witness: fixed parquet scan of this run's sf_dir
        # (see _io_calibrate — separates disk/page-cache weather from
        # cpu weather when adjudicating slot ratios)
        "io_calibration_s": _io_calibrate(spark, sf_dir),
        "loadavg": loadavg,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
