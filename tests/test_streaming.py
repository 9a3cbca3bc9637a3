"""Structured Streaming: the availableNow replay must agree with the
batch window operators over the same bounded input."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.queries_ext import q_window_tumbling
from airflow_crypto_etl_spark.streaming.windows import streaming_session, streaming_tumbling


def _key(rows, cols):
    return sorted(tuple(r[c] for c in cols) for r in rows)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    stream_out = streaming_tumbling(spark, sf_dir)
    batch_out = q_window_tumbling(spark, sf_dir)
    s = _key(stream_out.collect(), ["window_start", "event_type", "n_events"])
    b = _key(batch_out.collect(), ["window_start", "event_type", "n_events"])
    assert s == b
    assert stream_out.count() > 0


def test_streaming_session_emits_sessions(spark, sf_dir):
    out = streaming_session(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["session_end"] > r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_is_incremental(spark, sf_dir):
    # the stream source plans per-file splits; a second availableNow run
    # over the same static input is deterministic
    a = streaming_tumbling(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    b = streaming_tumbling(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]
    assert a == b


def test_foreachbatch_parquet_sink_equals_batch(spark, sf_dir, tmp_path):
    from airflow_crypto_etl_spark.streaming.windows import stream_to_parquet
    from airflow_crypto_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = str(tmp_path / "out")
    stream_to_parquet(spark, sf_dir, out, str(tmp_path / "ckpt"))
    landed = spark.read.parquet(out)
    batch = load_table(spark, sf_dir, "events")
    assert landed.count() == batch.count()
    # value totals survive the stream → parquet round trip exactly
    s = landed.agg(F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0][0]
    b = batch.agg(F.sum(F.col("value").cast("decimal(18,4)"))).collect()[0][0]
    assert s == b
    # partition layout is the medallion dt= shape
    import os
    assert any(d.startswith("event_date=") for d in os.listdir(out))


def test_streaming_ema_matches_pandas_reference(spark, sf_dir):
    """The stateful streaming EMA over the bounded replay must equal a
    single-process pandas ewm over the full per-symbol tick series —
    same kernel, so equality is exact, not approximate."""
    import pandas as pd

    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.stateful import EMA_PERIODS
    from airflow_crypto_etl_spark.streaming.windows import streaming_ema_per_symbol

    got = {r.symbol: r for r in streaming_ema_per_symbol(spark, sf_dir).collect()}

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value").toPandas()
    alpha = 2.0 / (EMA_PERIODS + 1.0)
    for sym, grp in ev.groupby("event_type"):
        grp = grp.sort_values(["ts", "event_id"])
        prices = grp["value"].round(4).astype("float64")  # PRICE_DEC quantization
        ref = prices.ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        assert got[sym].n_ticks == len(grp)
        assert got[sym].ema == ref


def test_streaming_ema_multi_chunk_group(spark, sf_dir):
    """Regression (sf1 leg): applyInPandasWithState yields a group in
    arrow-sized CHUNKS in shuffle order; the fold must sort the whole
    micro-batch once, not per chunk. Force the multi-chunk path at
    small scale by shrinking the arrow batch size — with the per-chunk
    sort bug this diverges wildly while n_ticks still matches."""
    import pandas as pd

    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.stateful import EMA_PERIODS
    from airflow_crypto_etl_spark.streaming.windows import streaming_ema_per_symbol

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "97")  # every sf0.001 group spans many chunks
    try:
        got = {r.symbol: r for r in streaming_ema_per_symbol(spark, sf_dir).collect()}
    finally:
        spark.conf.set(key, prev)

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    ).toPandas()
    alpha = 2.0 / (EMA_PERIODS + 1.0)
    for sym, grp in ev.groupby("event_type"):
        grp = grp.sort_values(["ts", "event_id"])
        prices = grp["value"].round(4).astype("float64")
        ref = prices.ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        assert got[sym].n_ticks == len(grp)
        assert got[sym].ema == ref


def test_watermarked_candles_drop_late_events(spark, tmp_path):
    """Append-mode watermark semantics, exercised across REAL
    micro-batches (one file per trigger): a candle whose window end is
    more than the lateness behind the max event time is closed by
    batch 2's watermark, and batch 2's late event for that hour must
    NOT reopen or change it."""
    import datetime as dt

    from pyspark.sql import types as T

    from airflow_crypto_etl_spark.streaming.windows import streaming_candles_watermarked

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = dt.datetime(2024, 1, 1)
    d = str(tmp_path / "ev")
    # batch 1: the hour-0 ticks
    b1 = [(1, base + dt.timedelta(minutes=10), "btc", 10.0),
          (2, base + dt.timedelta(minutes=40), "btc", 20.0)]
    # batch 2: a hour-6 tick ADVANCES the watermark (takes effect next
    # batch); batch 3 (spacer) runs under the advanced watermark and
    # EVICTS hour 0's state at its end
    b2 = [(3, base + dt.timedelta(hours=6), "btc", 30.0)]
    b3 = [(6, base + dt.timedelta(hours=6, minutes=10), "btc", 31.0)]
    # batch 4: a LATE hour-0 tick arriving after eviction (must be
    # dropped — a late row merging into still-LIVE state is legal Spark
    # semantics, verified empirically, which is why the eviction needs
    # its own spacer batch) plus a fresh hour-7 tick
    b4 = [(4, base + dt.timedelta(minutes=50), "btc", 99.0),
          (5, base + dt.timedelta(hours=7), "btc", 40.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(d + "/f=1")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(d + "/f=2")
    spark.createDataFrame(b3, schema).coalesce(1).write.parquet(d + "/f=3")
    spark.createDataFrame(b4, schema).coalesce(1).write.parquet(d + "/f=4")
    # flatten the two parts into one directory, two files
    import glob
    import shutil

    files = sorted(glob.glob(d + "/f=*/part-*.parquet"))
    out_dir = str(tmp_path / "stream_in")
    import os

    os.makedirs(out_dir)
    import time

    now = time.time()
    for i, f in enumerate(files):
        dst = f"{out_dir}/{i:02d}.parquet"
        shutil.copy(f, dst)
        # distinct mtimes: the file source orders (and therefore
        # batches) by modification time — equal stamps can collapse
        # both files into one trigger, defeating the cross-batch test
        os.utime(dst, (now + i * 60, now + i * 60))

    rows = streaming_candles_watermarked(spark, out_dir, schema).collect()
    keys = [(r.symbol, r.bucket) for r in rows]
    assert len(keys) == len(set(keys)), f"duplicate append emission: {keys}"
    got = {(r.symbol, r.bucket): r for r in rows}
    hour0 = got.get(("btc", base))
    # hour-0 candle was closed and evicted at batch 2's end: the late
    # 99.0 tick from batch 3 must be absent (and no duplicate row for
    # the hour may appear)
    assert hour0 is not None
    assert hour0.n_trades == 2
    assert float(hour0.high) == 20.0 and float(hour0.close) == 20.0


def test_streaming_cms_matches_batch_and_replays_idempotently(spark, sf_dir, tmp_path):
    """Incremental sketch maintenance: stream the documents in 3
    micro-batches (maxFilesPerTrigger=1), merge the per-batch partials,
    and the result equals the one-shot batch sketch; wiping the
    checkpoint and replaying overwrites the same batch partitions —
    byte-identical state, no double counting."""
    import shutil

    import pyspark.sql.functions as F

    from airflow_crypto_etl_spark.operators import sketch as sk
    from airflow_crypto_etl_spark.operators.text import tokens_col
    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.windows import cms_read, streaming_cms

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    state = str(tmp_path / "cms_state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_cms(stream, state, ckpt)

    merged = {(r["j"], r["cell"]): r["c"] for r in cms_read(spark, state).collect()}
    toks = docs.select(F.explode(tokens_col("text")).alias("tok"))
    whole = {(r["j"], r["cell"]): r["c"] for r in sk.cms_build(toks).collect()}
    assert merged == whole
    n_parts = spark.read.parquet(state).select("batch_id").distinct().count()
    assert n_parts >= 2  # really ran as multiple micro-batches

    # replay from scratch: same batches, same partitions, same state
    shutil.rmtree(ckpt)
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_cms(stream2, state, ckpt)
    again = {(r["j"], r["cell"]): r["c"] for r in cms_read(spark, state).collect()}
    assert again == whole


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark across real micro-batches: a
    duplicate key arriving within the delay is dropped; the same key
    arriving after the watermark passed its first occurrence is
    re-admitted (state expired) — exactly the bounded-state contract
    that unbounded dropDuplicates lacks."""
    import pyspark.sql.functions as F

    from airflow_crypto_etl_spark.streaming.windows import (
        run_available_now,
        streaming_dedup_watermarked,
    )

    src = str(tmp_path / "dup_stream")
    schema = "k string, ts timestamp"
    b1 = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 00:05:00")], "k string, ts string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts")
    b2 = spark.createDataFrame(
        [("a", "2024-01-01 00:30:00"),   # dup of 'a' within 1h delay -> dropped
         ("c", "2024-01-01 05:00:00")],  # advances watermark to 04:00
        "k string, ts string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts")
    b3 = spark.createDataFrame(
        [("d", "2024-01-01 05:30:00")],  # runs under wm=04:00 -> 'a' state
        "k string, ts string",           # (expiry 01:00) evicted at batch end
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts")
    b4 = spark.createDataFrame(
        [("a", "2024-01-01 06:00:00")],  # state gone -> re-admitted
        "k string, ts string",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) ts")
    import glob
    import os
    import time

    seen = set()
    for i, b in enumerate((b1, b2, b3, b4)):
        b.coalesce(1).write.mode("append").parquet(src)
        # micro-batch order follows file modification time; same-second
        # mtimes would make the order undefined, so pin them explicitly
        for f in glob.glob(os.path.join(src, "*.parquet")):
            if f not in seen:
                seen.add(f)
                t = time.time() + i * 10
                os.utime(f, (t, t))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    # file order across micro-batches follows modification time; the
    # three writes above land in order
    out = run_available_now(streaming_dedup_watermarked(stream, ["k"]), "append")
    rows = [(r["k"], str(r["ts"])) for r in out.collect()]
    ks = [k for k, _ in rows]
    assert ks.count("a") == 2          # first occurrence + post-expiry re-admit
    assert ks.count("b") == 1 and ks.count("c") == 1 and ks.count("d") == 1
    assert ("a", "2024-01-01 00:30:00") not in rows  # the in-window dup dropped


def test_stream_stream_left_outer_emits_unmatched_after_eviction(spark, tmp_path):
    """Left-outer interval join across REAL micro-batches: a click with
    a purchase inside its interval joins normally; a click with none is
    emitted exactly once WITH NULL purchase columns, and only after the
    watermark passes its join horizon (outer emission rides state
    eviction, which needs later batches to advance the watermark)."""
    import datetime as dt
    import glob
    import os
    import shutil
    import time

    from pyspark.sql import types as T

    from airflow_crypto_etl_spark.streaming.windows import streaming_join_left_outer

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    base = dt.datetime(2024, 1, 1)
    d = str(tmp_path / "ev")
    # batch 1: user 1 clicks and converts within 30 min; user 2 clicks
    # and never converts
    b1 = [
        (1, base + dt.timedelta(minutes=10), "click", 1),
        (2, base + dt.timedelta(minutes=20), "click", 2),
        (3, base + dt.timedelta(minutes=30), "purchase", 1),
    ]
    # batches 2-4 advance the watermark far past every horizon. BOTH
    # event types must keep flowing: the global watermark is the MIN of
    # the two sides' watermarks (multipleWatermarkPolicy=min), so a
    # click drought would freeze it at batch 1 and no eviction — hence
    # no outer emission — would ever happen (verified empirically).
    b2 = [
        (4, base + dt.timedelta(hours=6), "purchase", 99),
        (7, base + dt.timedelta(hours=6), "click", 98),
    ]
    b3 = [
        (5, base + dt.timedelta(hours=6, minutes=10), "purchase", 99),
        (8, base + dt.timedelta(hours=6, minutes=10), "click", 98),
    ]
    b4 = [
        (6, base + dt.timedelta(hours=6, minutes=20), "purchase", 99),
        (9, base + dt.timedelta(hours=6, minutes=20), "click", 98),
    ]
    for i, b in enumerate((b1, b2, b3, b4), start=1):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(d + f"/f={i}")
    files = sorted(glob.glob(d + "/f=*/part-*.parquet"))
    in_dir = str(tmp_path / "stream_in")
    os.makedirs(in_dir)
    now = time.time()
    for i, f in enumerate(files):
        dst = f"{in_dir}/{i:02d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now + i * 60, now + i * 60))

    rows = streaming_join_left_outer(spark, in_dir, schema).collect()
    by_click = {r.click_id: r for r in rows}
    # user 1's click matched its purchase inline
    assert by_click[1].purchase_id == 3 and by_click[1].user_id == 1
    # user 2's click was emitted EXACTLY ONCE as an outer row with null
    # purchase side, after the watermark passed its join horizon
    assert [r for r in rows if r.click_id == 2] == [by_click[2]]
    assert by_click[2].purchase_id is None and by_click[2].purchase_ts is None
    assert by_click[2].user_id == 2
    # the tail clicks (98's) are still inside their horizon at query
    # end — held in state, NOT emitted: outer rows only ride eviction
    assert not {7, 8, 9} & set(by_click)


def test_streaming_gram_multi_batch_equals_batch_sums(spark, sf_dir, tmp_path):
    """Incremental Gram maintenance across REAL micro-batch boundaries:
    stream the events in 3 files (maxFilesPerTrigger=1) so the stateful
    fold must carry state between batches, and the latest per-key sums
    must equal the one-shot batch aggregation exactly (integer sums —
    no tolerance)."""
    import pyspark.sql.functions as F

    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.stateful import streaming_gram
    from airflow_crypto_etl_spark.streaming.windows import run_available_now

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour(F.col("ts").cast("timestamp")).cast("long").alias("x1"),
        F.dayofmonth(F.col("ts").cast("timestamp")).cast("long").alias("x2"),
        (F.col("value").cast("decimal(18,4)") * 10000).cast("long").alias("yq"),
        "event_id",
    )
    src = str(tmp_path / "ev_stream")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).drop("event_id").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(ev.drop("event_id").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    upd = run_available_now(streaming_gram(stream), "update")
    sums = ["sx1", "sx2", "sy", "sx11", "sx12", "sx22", "sx1y", "sx2y", "syy"]
    latest = {
        r["event_type"]: r
        for r in upd.groupBy("event_type")
        .agg(F.max("n").alias("n"), *[F.max_by(c, "n").alias(c) for c in sums])
        .collect()
    }
    # stream really advanced state across batches: some key must have
    # been emitted more than once with growing n
    assert upd.groupBy("event_type").count().agg(F.max("count")).collect()[0][0] >= 2

    batch = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x1").alias("sx1"),
            F.sum("x2").alias("sx2"),
            F.sum("yq").alias("sy"),
            F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
            F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
            F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
            F.sum(F.col("x1") * F.col("yq")).alias("sx1y"),
            F.sum(F.col("x2") * F.col("yq")).alias("sx2y"),
            F.sum(F.col("yq") * F.col("yq")).alias("syy"),
        )
        .collect()
    }
    assert set(latest) == set(batch)
    for k, b in batch.items():
        got = latest[k]
        assert got["n"] == b["n"], k
        for c in sums:
            assert got[c] == b[c], (k, c)


def test_streaming_contamination_matches_batch_screen(spark, sf_dir):
    """The ingest-time streaming screen must emit EXACTLY the pair set
    of the batch minhash screen (same benchmark split, same threshold),
    and the per-row stateless signature must reproduce the batch
    explode+groupBy signature bit-for-bit."""
    from airflow_crypto_etl_spark.operators import dedup as dd
    from airflow_crypto_etl_spark.queries_ext import q_contamination_minhash
    from airflow_crypto_etl_spark.streaming.windows import streaming_contamination
    from airflow_crypto_etl_spark.sources.tables import load_table

    stream_rows = {
        (r["doc_id"], r["bench_id"], r["est_jaccard"])
        for r in streaming_contamination(spark, sf_dir).collect()
    }
    batch_rows = {
        (r["doc_id"], r["bench_id"], r["est_jaccard"])
        for r in q_contamination_minhash(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
    assert stream_rows, "fixture corpus should contain contaminated pairs"

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ok = docs.filter(F.expr(f"size({dd._tokens_sql('text')}) >= 3"))
    arr = ok.select("doc_id", dd.minhash_sig_array("text").alias("sig"))
    batch_arr = (
        dd.minhash_signatures(docs)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("s"))
        .select("doc_id", F.transform("s", lambda x: x["mh"]).alias("bsig"))
    )
    bad = arr.join(batch_arr, "doc_id").filter(F.col("sig") != F.col("bsig")).count()
    assert bad == 0


def test_contamination_pair_dedup_state_evicts(spark, tmp_path):
    """The contamination gate's pair-dedup state is watermark-BOUNDED
    (r8 verdict item 2), proven across four real micro-batches: the
    same contaminated doc re-arriving within the 1 h delay is dropped
    (one emission despite every band colliding), a later arrival
    advances the watermark past the pair's expiry and EVICTS its state,
    and a post-eviction re-arrival is re-admitted — exactly the
    bounded-state contract unbounded dropDuplicates lacks (the
    dropDuplicatesWithinWatermark proof pattern of
    test_drop_duplicates_within_watermark_bounds_state)."""
    import glob
    import os
    import time

    from airflow_crypto_etl_spark.streaming.windows import (
        contamination_screen,
        run_available_now,
    )

    t_a = "alpha beta gamma delta epsilon zeta eta theta"
    t_b = "one two three four five six seven eight nine"
    bench = spark.createDataFrame([(7, t_a), (27, t_b)], "bench_id long, text string")

    src = str(tmp_path / "contam_stream")
    schema = "doc_id long, text string, ingest_ts timestamp"
    batches = [
        [(1, t_a, "2024-01-01 00:00:00")],  # emits (1, 7)
        [(1, t_a, "2024-01-01 00:30:00")],  # dup within 1h delay -> dropped
        [(2, t_b, "2024-01-01 05:00:00")],  # emits (2, 27); advances the
                                            # watermark to 04:00 for the NEXT batch
        [(3, t_b, "2024-01-01 05:30:00")],  # emits (3, 27); runs under wm=04:00
                                            # -> (1, 7) state (expiry 01:00)
                                            # evicted at batch end
        [(1, t_a, "2024-01-01 06:00:00")],  # state gone -> re-admitted
    ]
    seen: set[str] = set()
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts string"
        ).selectExpr(
            "doc_id", "text", "CAST(ingest_ts AS TIMESTAMP) ingest_ts"
        ).coalesce(1).write.mode("append").parquet(src)
        # micro-batch order follows file modification time; pin it
        for f in glob.glob(os.path.join(src, "*.parquet")):
            if f not in seen:
                seen.add(f)
                t = time.time() + i * 10
                os.utime(f, (t, t))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = run_available_now(contamination_screen(stream, bench), "append")
    pairs = [(r["doc_id"], r["bench_id"]) for r in out.collect()]
    # identical text -> est_jaccard 1.0, ALL bands collide: the single
    # emission per admitted arrival is the cross-band dedup working
    assert pairs.count((1, 7)) == 2  # first arrival + post-eviction re-admit
    assert pairs.count((2, 27)) == 1 and pairs.count((3, 27)) == 1
    assert len(pairs) == 4
    assert all(r["est_jaccard"] == 1.0 for r in out.collect())


def test_streaming_ann_ingest_matches_batch_lookup(spark, sf_dir, tmp_path):
    """Streaming ANN ingest over a PERSISTED index: the new-vector
    stream arrives as 3 micro-batches (maxFilesPerTrigger=1), each
    searched via foreachBatch + ivf_index_lookup against the same
    stored (centroids, assign) pair; the union of the per-batch
    results is row-identical to the one-shot batch lookup on the same
    vectors — the index is built ONCE, before the stream starts."""
    import pyspark.sql.functions as F

    from airflow_crypto_etl_spark.operators import similarity as sim
    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.windows import streaming_ann_ingest

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cap = (2 * emb.count()) // 16
    cents, assign = sim.ivf_index_build(emb, list_cap=cap, spread=False)
    cents.write.parquet(str(tmp_path / "centroids"))
    assign.write.parquet(str(tmp_path / "assign"))
    cents_p = spark.read.parquet(str(tmp_path / "centroids"))
    assign_p = spark.read.parquet(str(tmp_path / "assign"))

    new_vecs = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    src = str(tmp_path / "vec_stream")
    for i in range(3):
        new_vecs.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "ann_out")
    stream = (
        spark.readStream.schema(new_vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_ann_ingest(
        stream, emb, cents_p, assign_p, out, str(tmp_path / "ckpt"), k=5
    )

    got_parts = spark.read.parquet(out)
    assert got_parts.select("batch_id").distinct().count() >= 3
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in got_parts.select("query_id", "neighbor_id", "cos", "rank").collect()
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
        for r in sim.ivf_index_lookup(
            new_vecs, emb, cents_p, assign_p, k=5, spread=False
        ).collect()
    )
    assert got == want and len(got) > 0
    # every streamed vector found its own original at rank 1, cos ~1
    top = {q: n for q, n, c, rk in got if rk == 1}
    assert len(top) == new_vecs.count()
    for q, n in top.items():
        assert n == q - 1000000


def test_streaming_ann_ingest_grows_index(spark, sf_dir, tmp_path):
    """r11: with index_append_dir set, every micro-batch's vectors are
    ALSO assigned into the index — the union of the base assign table
    and the appended batch_id= partitions is row-identical to a
    rebuild over the union corpus with the same quantizer, so the
    index the NEXT day's ingest searches includes today's batches."""
    import pyspark.sql.functions as F

    from airflow_crypto_etl_spark.operators import similarity as sim
    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.windows import streaming_ann_ingest

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents, assign = sim.ivf_index_build(emb, spread=False)
    cents.write.parquet(str(tmp_path / "centroids"))
    assign.write.parquet(str(tmp_path / "assign"))
    cents_p = spark.read.parquet(str(tmp_path / "centroids"))
    assign_p = spark.read.parquet(str(tmp_path / "assign"))

    new_vecs = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    src = str(tmp_path / "vec_stream")
    for i in range(3):
        new_vecs.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(new_vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    appended_dir = str(tmp_path / "assign_appended")
    streaming_ann_ingest(
        stream, emb, cents_p, assign_p, str(tmp_path / "ann_out"),
        str(tmp_path / "ckpt"), k=5, index_append_dir=appended_dir,
    )
    appended = spark.read.parquet(appended_dir)
    assert appended.select("batch_id").distinct().count() >= 3
    grown = assign_p.unionByName(appended.select("cid", "vec_id"))
    union_corpus = emb.unionByName(new_vecs)
    _, rebuilt = sim.ivf_index_build(
        union_corpus, spread=False, centroids=cents_p.select("cid", "cv")
    )
    got = sorted((r["cid"], r["vec_id"]) for r in grown.collect())
    want = sorted((r["cid"], r["vec_id"]) for r in rebuilt.collect())
    assert got == want and len(got) == union_corpus.count()


def test_streaming_dedup_ingest_matches_batch_lookup_and_grows_index(
    spark, sf_dir, tmp_path
):
    """Streaming near-dup ingest over a PERSISTED MinHash index (the
    dedup twin of streaming_ann_ingest): the new-document stream
    arrives as 3 micro-batches, each looked up via foreachBatch +
    minhash_lookup against the same stored (sig, bands) pair; the
    union of the per-batch match rows is row-identical to the one-shot
    lookup on the same documents. With index_append_dir set, each
    batch's own (sig, bands) rows land as batch_id= partitions and the
    union of base + appended tables equals a rebuild over the union
    corpus — the index the next day's ingest searches includes
    today's batches."""
    from airflow_crypto_etl_spark.operators import dedup as dd
    from airflow_crypto_etl_spark.sources.tables import load_table
    from airflow_crypto_etl_spark.streaming.windows import streaming_dedup_ingest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = dd.minhash_signatures(docs)
    sig.write.parquet(str(tmp_path / "sig"))
    dd.minhash_bands(sig).write.parquet(str(tmp_path / "bands"))
    sig_p = spark.read.parquet(str(tmp_path / "sig"))
    bands_p = spark.read.parquet(str(tmp_path / "bands"))

    new_docs = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    src = str(tmp_path / "doc_stream")
    for i in range(3):
        new_docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    out = str(tmp_path / "dedup_out")
    appended_dir = str(tmp_path / "index_appended")
    stream = (
        spark.readStream.schema(new_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streaming_dedup_ingest(
        stream, sig_p, bands_p, out, str(tmp_path / "ckpt"),
        threshold=0.5, index_append_dir=appended_dir,
    )

    got_parts = spark.read.parquet(out)
    assert got_parts.select("batch_id").distinct().count() >= 3
    got = sorted(
        (r["new_id"], r["corpus_id"], r["est_jaccard"])
        for r in got_parts.select("new_id", "corpus_id", "est_jaccard").collect()
    )
    want = sorted(
        (r["new_id"], r["corpus_id"], r["est_jaccard"])
        for r in dd.minhash_lookup(new_docs, sig_p, bands_p, threshold=0.5).collect()
    )
    assert got == want and len(got) > 0
    # every streamed doc matched its own original at est_jaccard 1.0
    exact = {(a, b) for a, b, e in got if e == 1.0}
    assert {(d + 1000000, d) for (d,) in
            new_docs.select((F.col("doc_id") - 1000000).alias("d")).collect()} <= exact

    # the appended index partitions union with the base tables to a
    # rebuild over the union corpus (signatures are per-document)
    app_sig = spark.read.parquet(f"{appended_dir}/sig")
    app_bands = spark.read.parquet(f"{appended_dir}/bands")
    assert app_sig.select("batch_id").distinct().count() >= 3
    union_corpus = docs.unionByName(new_docs)
    full_sig = dd.minhash_signatures(union_corpus)
    got_sig = sorted(
        (r["doc_id"], r["i"], r["mh"])
        for r in sig_p.unionByName(app_sig.select("doc_id", "i", "mh")).collect()
    )
    want_sig = sorted((r["doc_id"], r["i"], r["mh"]) for r in full_sig.collect())
    assert got_sig == want_sig
    got_bands = sorted(
        (r["doc_id"], r["band"], r["band_sig"])
        for r in bands_p.unionByName(
            app_bands.select("doc_id", "band", "band_sig")
        ).collect()
    )
    want_bands = sorted(
        (r["doc_id"], r["band"], r["band_sig"])
        for r in dd.minhash_bands(full_sig).collect()
    )
    assert got_bands == want_bands
    dd.release_caches()
