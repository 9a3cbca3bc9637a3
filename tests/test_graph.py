"""Deterministic PageRank: quantized-recursion exactness, partitioning
invariance, and agreement with a pure-python reference on a hand-built
graph."""

from __future__ import annotations

import pytest

from airflow_crypto_etl_spark.operators import graph as gr
from airflow_crypto_etl_spark.sources.tables import load_table

QUANT = 1099511627776.0  # 2^40


def _reference_pagerank(edges, nodes, damping=0.85, iters=2):
    """Independent scalar implementation of the SAME quantized
    recursion (dict-based, no Spark)."""
    import math

    n = len(nodes)
    outw = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    pr = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        sums = {v: 0 for v in nodes}
        for s, d, w in edges:
            sums[d] += math.floor(pr[s] * w / outw[s] * QUANT)
        dang = sum(math.floor(pr[v] * QUANT / n) for v in nodes if v not in outw)
        pr = {v: base + damping * ((sums[v] + dang) / QUANT) for v in nodes}
    return pr


def test_pagerank_matches_reference_on_hand_graph(spark):
    # 1 -> 2 -> 3 -> 1 cycle plus a dangling node 4 fed by 1
    edges = [(1, 2, 3), (2, 3, 1), (3, 1, 1), (1, 4, 1)]
    nodes = [1, 2, 3, 4]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    nd = spark.createDataFrame([(v,) for v in nodes], "node long")
    got = {r["node"]: r["pr"] for r in gr.pagerank(e, nd, iters=2).collect()}
    exp = _reference_pagerank(edges, nodes, iters=2)
    assert got == exp  # bit-exact, not approx


def test_pagerank_partitioning_invariance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    edges = gr.transition_edges(ev)
    nodes = ev.select("user_id").distinct()
    a = {r["node"]: r["pr"] for r in gr.pagerank(edges.repartition(3), nodes, iters=2).collect()}
    b = {r["node"]: r["pr"] for r in gr.pagerank(edges.repartition(17), nodes, iters=2).collect()}
    assert a == b


def test_pagerank_mass_conserved(spark, sf_dir):
    """Total rank stays ~1 (off only by the ≤2^-40-per-term floor
    quantization), and every rank is positive."""
    ev = load_table(spark, sf_dir, "events")
    edges = gr.transition_edges(ev)
    nodes = ev.select("user_id").distinct()
    pr = gr.pagerank(edges, nodes, iters=2).collect()
    total = sum(r["pr"] for r in pr)
    assert total == pytest.approx(1.0, abs=1e-6)
    assert all(r["pr"] > 0 for r in pr)


def test_transition_edges_no_self_loops_and_counts(spark):
    rows = [
        (0, "2024-01-01 00:00:00", 1, "click"),
        (1, "2024-01-01 00:01:00", 2, "click"),
        (2, "2024-01-01 00:02:00", 1, "click"),
        (3, "2024-01-01 00:03:00", 1, "click"),  # self-transition 1->1 dropped
        (4, "2024-01-01 00:04:00", 2, "click"),
        (5, "2024-01-01 00:00:30", 9, "view"),   # separate stream
        (6, "2024-01-01 00:05:00", 1, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type")
    got = {(r["src"], r["dst"]): r["w"] for r in gr.transition_edges(df).collect()}
    assert got == {(1, 2): 2, (2, 1): 1, (9, 1): 1}


def test_label_propagation_laws(spark, sf_dir):
    """Conservation + convergence-direction laws: every node keeps
    exactly one label, labels are node ids, community sizes sum to the
    node count, and a second round never increases the community count
    (labels only coalesce under propagation on a fixed graph)."""
    from pyspark.sql import functions as F

    from airflow_crypto_etl_spark.queries import _t

    ev = _t(spark, sf_dir, "events")
    edges = gr.transition_edges(ev)
    nodes = ev.select(F.col("user_id").alias("node")).distinct()
    n_nodes = nodes.count()
    node_ids = {r["node"] for r in nodes.collect()}

    l1 = gr.label_propagation(edges, nodes, iters=1)
    l2 = gr.label_propagation(edges, nodes, iters=2)
    for labels in (l1, l2):
        rows = labels.collect()
        assert len(rows) == n_nodes
        assert {r["node"] for r in rows} == node_ids
        assert {r["lbl"] for r in rows} <= node_ids
    assert (
        l2.select("lbl").distinct().count() <= l1.select("lbl").distinct().count()
    )
    # an isolated node (no edges touching it) keeps its own label
    touched = {r["src"] for r in edges.select("src").collect()} | {
        r["dst"] for r in edges.select("dst").collect()
    }
    isolated = node_ids - touched
    if isolated:
        kept = {
            r["node"]: r["lbl"]
            for r in l2.where(F.col("node").isin(*list(isolated)[:50])).collect()
        }
        assert all(n == l for n, l in kept.items())
