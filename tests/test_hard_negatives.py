"""LSH-bucketed hard-negative mining (r8): the all-anchor scale path of
operators/similarity.hard_negatives_lsh, plus its recall gate.

Reference parity note: the reference pipeline has no ANN/contrastive
surface — this family is part of the training-data-pipeline extension
(SURVEY.md LLM-prep battery), so the checks here are against the exact
broadcast miner and first-principles cosine, not reference files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import similarity as sim
from airflow_crypto_etl_spark.sources.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_hn_lsh_output_contract(spark, sf_dir):
    """Every mined row: cross-label, neighbor != anchor, rank within k,
    ranks contiguous from 1 per anchor."""
    out = sim.hard_negatives_lsh(
        _emb(spark, sf_dir), k=3, anchor_pred=F.col("vec_id") % 50 == 0, spread=False
    ).collect()
    assert out, "probe corpus should mine at least one negative"
    by_anchor: dict[int, list[int]] = {}
    for r in out:
        assert r["query_label"] != r["neighbor_label"]
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 3
        by_anchor.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_anchor.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hn_lsh_scores_are_true_cosines(spark, sf_dir):
    """Each emitted cos must equal the first-principles cosine of the
    pair (same fold order), and each anchor's mined set must be ranked
    by descending cos with the id tiebreak."""
    emb = _emb(spark, sf_dir)
    mined = sim.hard_negatives_lsh(
        emb, k=3, anchor_pred=F.col("vec_id") < 40, spread=False
    )
    a = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    b = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    qv = sim._to_double(F.col("qe"))
    nv = sim._to_double(F.col("ne"))
    joined = mined.join(a, "query_id").join(b, "neighbor_id").withColumn(
        "true_cos", sim.dot(qv, nv) / (sim.norm2(qv) * sim.norm2(nv))
    )
    rows = joined.collect()
    assert rows
    for r in rows:
        assert abs(r["cos"] - r["true_cos"]) < 1e-12
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append((r["rank"], -r["cos"], r["neighbor_id"]))
    for seq in per.values():
        assert sorted(seq) == sorted(seq, key=lambda t: t[0])


def test_hn_lsh_subset_of_exact_candidates(spark, sf_dir):
    """LSH-mined negatives are a subset of the exact cross-label
    ranking's pair set (LSH only PRUNES candidates, never invents
    pairs), and per pair the scores agree bitwise."""
    emb = _emb(spark, sf_dir)
    qids = [0, 1, 2, 3]
    exact = sim.hard_negatives(emb, qids, k=10**6, spread=False)
    approx = sim.hard_negatives_lsh(
        emb, k=5, anchor_pred=F.col("vec_id").isin(qids), spread=False
    )
    ex = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        assert key in ex, f"LSH invented a pair not in the exact cross-label set: {key}"
        assert r["cos"] == ex[key]


def test_hn_recall_bounds_and_determinism(spark, sf_dir):
    """Recall is in [0, 1] per anchor and stable across two runs."""
    emb = _emb(spark, sf_dir)
    r1 = {r["query_id"]: r["recall"] for r in sim.hard_negatives_recall(emb, [0, 1, 2, 3], k=5).collect()}
    r2 = {r["query_id"]: r["recall"] for r in sim.hard_negatives_recall(emb, [0, 1, 2, 3], k=5).collect()}
    assert r1 == r2
    assert set(r1) == {0, 1, 2, 3}
    assert all(0.0 <= v <= 1.0 for v in r1.values())


def test_hn_lsh_bucket_cap_drops_dense_cells_wholesale(spark, sf_dir):
    """bucket_cap=0 drops every (table, bucket) cell → zero rows;
    a cap far above the corpus size changes nothing (the lsh_near_pairs
    stop-shingle contract, mirrored)."""
    emb = _emb(spark, sf_dir)
    pred = F.col("vec_id") % 50 == 0
    assert (
        sim.hard_negatives_lsh(emb, k=3, anchor_pred=pred, bucket_cap=0, spread=False).count()
        == 0
    )
    uncapped = sim.hard_negatives_lsh(emb, k=3, anchor_pred=pred, spread=False)
    huge_cap = sim.hard_negatives_lsh(
        emb, k=3, anchor_pred=pred, bucket_cap=10**9, spread=False
    )
    assert sorted(map(tuple, uncapped.collect())) == sorted(map(tuple, huge_cap.collect()))


def test_hn_lsh_plan_has_no_cartesian_and_no_anchor_broadcast_hint(spark, sf_dir):
    """The all-anchor plan must contain no CartesianProduct / nested-
    loop product (the broadcast miner's shape) — candidates come from
    the bucket equi-join. Broadcast NODES are allowed (AQE elects them
    for measured-small sides at probe scale); a cartesian is not."""
    emb = _emb(spark, sf_dir)
    plan = (
        sim.hard_negatives_lsh(emb, k=3, spread=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hn_lsh_null_labels_are_dropped(spark, sf_dir):
    """Documented contract (ADVICE r7): the cross-label inequality is
    null-rejecting, so null-labeled rows never appear on either side."""
    emb = _emb(spark, sf_dir).withColumn(
        "label", F.when(F.col("vec_id") % 2 == 0, F.col("label"))
    )
    out = sim.hard_negatives_lsh(
        emb, k=3, anchor_pred=F.col("vec_id") < 20, spread=False
    ).collect()
    for r in out:
        assert r["query_id"] % 2 == 0, "null-labeled anchor mined a negative"
        assert r["neighbor_id"] % 2 == 0, "null-labeled corpus row emitted"
        assert r["query_label"] is not None and r["neighbor_label"] is not None
