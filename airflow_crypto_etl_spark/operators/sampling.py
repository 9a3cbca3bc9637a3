"""Deterministic distributed sampling for training-data pipelines.

Two samplers, both driven by the engine-portable affine hash (see
functions.hashing) instead of `rand()`, so a sample is reproducible
across runs, engines (the DuckDB oracle replays it exactly), and
cluster sizes — a requirement for auditable dataset construction that
`df.sample()` (partition-dependent RNG) cannot meet:

* :func:`sample_fraction` — keep a hash-thresholded fraction of rows;
  pure map-side filter, zero shuffle, composes with train_test_split.
* :func:`sample_bottomk_stratified` — EXACTLY ``n`` rows per stratum,
  the n with the smallest hash (bottom-k sampling, the classic
  order-by-hash construction: a uniform random sample under any
  hash-uniformity assumption, and mergeable across partitions).

Scale design
------------
bottom-k uses one shuffle keyed on the stratum. Per-stratum state is a
size-n heap (Spark's WindowExec sort buffer); for a HEAVILY skewed
stratum at 100 TB use :func:`sample_bottomk_twophase`, which
pre-filters with a per-stratum approximate hash threshold so only
~O(n) candidate rows per stratum reach the exact window — the
(1 - n/N) bulk of each stratum is dropped map-side. The direct form
is the right plan whenever n × strata fits executor memory, which
covers sampling-for-eval at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, affine_hash

# Fixed member of the affine family reserved for sampling, disjoint
# from the MinHash members (0..K-1 with K=16) by offset.
SAMPLE_HASH_SEED = 101


def sample_hash(key: Column) -> Column:
    """The sampling hash: affine family member SAMPLE_HASH_SEED over a
    BIGINT key, in [0, 2^31-1)."""
    return affine_hash(key.cast("bigint"), F.lit(SAMPLE_HASH_SEED))


def sample_fraction(df: DataFrame, key_col: str, fraction: float, resolution: int = 10_000) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    (mod ``resolution``) falls below ``fraction * resolution``. Integer
    threshold arithmetic — no float comparison, no rand(); map-side
    only."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(round(fraction * resolution))
    return df.where(sample_hash(F.col(key_col)) % resolution < threshold)


def sample_bottomk_stratified(
    df: DataFrame, stratum_col: str, key_col: str, n: int
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: the n smallest by
    (hash, key). The key tie-break makes the sample total-ordered and
    thus unique even on hash collisions."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = sample_hash(F.col(key_col))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )


def sample_bottomk_twophase(
    df: DataFrame, stratum_col: str, key_col: str, n: int, safety: float = 2.0
) -> DataFrame:
    """Bottom-k per stratum for skewed/huge strata: identical output to
    :func:`sample_bottomk_stratified`, different physical plan.

    Phase 1 is just a per-stratum COUNT (one partial-aggregable
    shuffle of (stratum) keys — never the payload). Because the
    sampling hash is uniform on [0, P), the n-th smallest hash in a
    stratum of size c concentrates at ≈ n/c · P, so the candidate
    threshold ``safety · n · P / c`` needs no quantile sketch at all —
    integer arithmetic on the count. Phase 2 broadcasts that tiny
    threshold table, drops everything above the threshold MAP-SIDE,
    and runs the exact rank window on the ~safety·n expected survivors
    per stratum — the window's sort buffer is O(n), not O(|stratum|).

    The estimate may undershoot (hash clustering is possible, just
    exponentially unlikely at safety ≥ 2); any stratum whose candidate
    set comes up short of min(n, |stratum|) falls back to the direct
    window, so correctness never depends on the uniformity assumption.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    h = sample_hash(F.col(key_col))
    with_h = df.withColumn("_h", h)
    stats = with_h.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_cnt")).withColumn(
        "_thresh",
        F.least(
            F.lit(float(MERSENNE_P)),
            F.lit(float(safety) * n * MERSENNE_P) / F.col("_cnt"),
        ),
    )
    w = Window.partitionBy(stratum_col).orderBy(F.col("_h").asc(), F.col(key_col).asc())
    candidates = (
        with_h.join(F.broadcast(stats), stratum_col)
        .where((F.col("_h") <= F.col("_thresh")) | (F.col("_cnt") <= n))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )
    # Undershoot guard: strata where the thresholded candidate set came
    # up short re-run through the direct window. With safety ≥ 2 this
    # is rare (Greenwald-Khanna error is bounded), so the fallback scan
    # is almost always empty — but correctness never depends on the
    # sketch.
    # LEFT join from stats: a stratum whose candidate set is EMPTY has
    # no group row at all and an inner join would lose it — the
    # missing-group trap.
    short = (
        stats.join(
            candidates.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_got")),
            stratum_col,
            "left",
        )
        .where(F.coalesce("_got", F.lit(0)) < F.least(F.lit(n), F.col("_cnt")))
        .select(stratum_col)
    )
    direct = (
        with_h.join(F.broadcast(short), stratum_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n)
    )
    keep = [*df.columns, "sample_rank"]
    rescued = candidates.join(F.broadcast(short), stratum_col, "left_anti")
    return rescued.select(*keep).unionByName(direct.select(*keep))


def sample_hash_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`sample_hash` (same value, same key)."""
    from ..functions.hashing import affine_hash_sql

    return affine_hash_sql(f"CAST({key_expr} AS BIGINT)", str(SAMPLE_HASH_SEED))


__all__ = [
    "MERSENNE_P",
    "SAMPLE_HASH_SEED",
    "sample_bottomk_stratified",
    "sample_bottomk_twophase",
    "sample_fraction",
    "sample_hash",
    "sample_hash_sql",
]
