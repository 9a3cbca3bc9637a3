"""Mergeable frequency sketch: count-min (Cormode & Muthukrishnan 2005).

Complements the engine's other sketch aggregates (HLL distinct via
``hll_sketch_agg``, quantiles via ``percentile_approx``) with the
point-frequency member of the family — and unlike those, this one is
built from the repo's engine-portable integer hashes
(`functions/hashing.py`), so the whole sketch is DETERMINISTIC and a
SQL oracle reproduces every counter exactly (q_cms_counts).

Why a sketch at 100 TB: exact per-token counts over a web corpus have
vocabulary-sized state (billions of keys); the CMS is a fixed
depth×width integer grid (KBs) that supports point estimates with
one-sided error (est ≥ true, overshoot bounded by collisions). The
build is ONE partial-agg shuffle whose post-shuffle size is depth·width
— independent of corpus size — and sketches MERGE by cell-wise addition
(a distributive aggregate), so per-partition / per-day partial sketches
roll up losslessly (tested).

Provenance: engine extension; standard CMS construction with the
repo's affine hash family replacing RNG-seeded hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import affine_hash, char_hash

DEPTH = 4
WIDTH = 512


def _cells(h: Column, depth: int, width: int) -> Column:
    """Array of (j, cell) structs for one hashed key."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (affine_hash(h, F.lit(j)) % F.lit(width)).cast("int").alias("cell"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    tokens: DataFrame, token_col: str = "tok", depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Build the sketch from a one-row-per-occurrence token stream:
    explode each occurrence into its depth cells, then ONE partial-agg
    groupBy — post-shuffle size depth·width regardless of corpus rows.
    Returns (j, cell, c)."""
    h = char_hash(F.col(token_col))
    return (
        tokens.select(F.explode(_cells(h, depth, width)).alias("jc"))
        .groupBy(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition — the distributive merge that makes partial
    (per-partition, per-day) sketches roll up losslessly."""
    return (
        a.unionByName(b).groupBy("j", "cell").agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "tok",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-frequency estimates: min over the key's depth counters
    (absent cell = 0). The sketch is depth·width rows — broadcast, so
    the query side never shuffles."""
    h = char_hash(F.col(token_col))
    qc = queries.select(
        token_col, F.explode(_cells(h, depth, width)).alias("jc")
    ).select(token_col, F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    joined = qc.join(F.broadcast(sketch), ["j", "cell"], "left")
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est")
    )
