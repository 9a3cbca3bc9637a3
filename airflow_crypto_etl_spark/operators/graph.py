"""Graph operators over relational edge lists: weighted PageRank.

Complements the dedup family's iterative min-label propagation
(`operators/dedup.duplicate_clusters`) with the other canonical
iterative-fixpoint shape: per-iteration JOIN + partial-agg, driver loop
bounded by ``iters``. The graph is built FROM the data (per-stream
user-transition hand-offs in the events table), not synthesized.

Determinism contract (what makes q_pagerank fully hash-checkable):
float summation over a shuffle is merge-order-dependent, so each
node's incoming probability mass is quantized to an INTEGER before the
sum — contribution = floor(((pr·w)/outw)·2^40) — making every
iteration bit-reproducible on any partitioning and any engine. The
quantized recursion IS the defined algorithm (error ≤ 2^-40 per edge
per step, far below ranking resolution); the same trick the market
battery uses for merge-order-free variance sums.

Scale: per iteration, the corpus-sized work is one equi-join of the
edge list with the k-node rank table and one partial-agg shuffle keyed
by dst. Edge and out-weight tables are computed once and cached; the
dangling-mass scalar is the only driver-side value per iteration.
100 TB edge lists iterate at O(scan) per round with map-side combine.

Provenance: engine extension (the reference has no graph surface);
PageRank per Page et al. 1999, dangling-mass handling per the standard
power-iteration formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1099511627776.0  # 2^40 — exact power-of-two quantization scale


def transition_edges(
    events: DataFrame,
    stream_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Weighted user-transition edges: within each stream (events of one
    type, ordered by time with the id as tiebreak), an edge src→dst for
    each consecutive pair of distinct users, weighted by transition
    count. One window pass + one partial-agg groupBy."""
    w = Window.partitionBy(stream_col).orderBy(ts_col, id_col)
    e = events.withColumn("dst", F.lead(user_col).over(w)).where(
        F.col("dst").isNotNull() & (F.col("dst") != F.col(user_col))
    )
    return e.groupBy(F.col(user_col).alias("src"), F.col("dst")).agg(
        F.count(F.lit(1)).alias("w")
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    damping: float = 0.85,
    iters: int = 2,
) -> DataFrame:
    """Deterministic weighted PageRank with dangling-mass redistribution.

    pr_{t+1}(v) = (1-d)/N + d · (Σ_{(u,v)∈E} q(u,v) + D_t) / 2^40
    where q(u,v) = floor(((pr_t(u)·w)/outw(u))·2^40) and
    D_t = Σ_{u dangling} floor((pr_t(u)·2^40)/N).

    All shuffled sums are over INTEGERS (exact, order-free); every
    float op has a pinned order, so the result is bit-identical on any
    partitioning — and to the unrolled SQL oracle.
    """
    node_col = nodes.columns[0]
    n = nodes.count()
    base = (1.0 - damping) / n
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    edges_out = edges.join(outw, "src").localCheckpoint(eager=False)
    pr = nodes.select(F.col(node_col).alias("node")).withColumn(
        "pr", F.lit(1.0) / F.lit(n)
    )
    for _ in range(iters):
        contrib = edges_out.join(pr.withColumnRenamed("node", "src"), "src").select(
            "dst",
            F.floor(F.col("pr") * F.col("w") / F.col("outw") * F.lit(QUANT)).alias("cq"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("cq").alias("sq"))
        # dangling mass as an IN-PLAN broadcast scalar, not a driver
        # collect: the per-iteration collect was a separate Spark job
        # per round (guide §1.2 — the checkpoint job below computes the
        # same aggregate as a 1-row cross join for free); the integer
        # sum is identical, so the blend arithmetic is bit-unchanged
        dang = (
            pr.join(outw.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.floor(F.col("pr") * F.lit(QUANT) / F.lit(n))), F.lit(0)
                ).alias("__dang")
            )
        )
        pr = (
            pr.select("node")
            .join(sums.withColumnRenamed("dst", "node"), "node", "left")
            .join(F.broadcast(dang), F.lit(True))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        (F.coalesce(F.col("sq"), F.lit(0)) + F.col("__dang")).cast("double")
                        / F.lit(QUANT)
                    )
                ).alias("pr"),
            )
        )
        # rank table is O(nodes): truncate the per-iteration lineage so
        # the next round doesn't recompute the whole chain (the
        # duplicate_clusters checkpoint discipline)
        pr = pr.localCheckpoint(eager=True)
    return pr


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count with DEGREE ORIENTATION (the standard
    skew-bounding trick): undirect + dedup the edge list, then orient
    every edge from the lower-(degree, id) endpoint to the higher one —
    each oriented node's out-degree is O(sqrt(|E|)) on any graph, so
    the wedge join e1(u,v) ⋈ e2(v,w) fans out by out-degree of the
    SMALLER endpoint instead of a hub's full degree. Triangles = wedges
    closed by a third oriented edge (u,w); each triangle is counted
    exactly once. Two equi-joins, no products.

    Returns a 1-row DataFrame (n_triangles)."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    orient = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1 = orient.select(F.col("u").alias("x"), F.col("v").alias("y"))
    e2 = orient.select(F.col("u").alias("y"), F.col("v").alias("z"))
    wedges = e1.join(e2, "y").select("x", "z")
    e3 = orient.select(F.col("u").alias("x"), F.col("v").alias("z"))
    tri = wedges.join(e3, ["x", "z"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def label_propagation(
    edges: DataFrame, nodes: DataFrame, iters: int = 2
) -> DataFrame:
    """Synchronous label propagation for community detection (Raghavan
    et al. 2007, public): every node starts as its own label; each
    round it adopts the label with the highest incident edge weight
    among its neighbors — ties broken by SMALLEST label, making every
    round (and therefore the fixpoint prefix) deterministic and
    engine-replayable. Isolated nodes keep their own label.

    Engine mapping: the graph is symmetrized once (union + re-agg);
    each round is one equi-join (edge × label), one partial-agg groupBy
    on (node, label), and a per-node row_number argmax — the same
    shuffle budget as a PageRank iteration, with CONSTANT-size label
    state (one row per node). ``nodes`` must carry a ``node`` column."""
    # contract: self-loops are IGNORED. Dropping src==dst before the
    # union matters because symmetrization would otherwise double a
    # self-loop's weight (r5 ADVICE — the shipped caller pre-filters
    # them, but the operator must not depend on that).
    edges = edges.where(F.col("src") != F.col("dst"))
    und = (
        edges.select("src", "dst", "w")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    labels = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(iters):
        scores = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.sum("w").alias("wsum"))
        )
        w_rank = Window.partitionBy("node").orderBy(
            F.col("wsum").desc(), F.col("lbl").asc()
        )
        best = (
            scores.withColumn("rn", F.row_number().over(w_rank))
            .where(F.col("rn") == 1)
            .select("node", F.col("lbl").alias("new_lbl"))
        )
        labels = labels.join(best, "node", "left").select(
            "node", F.coalesce("new_lbl", "lbl").alias("lbl")
        )
    return labels
