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
stratum at 100 TB, pre-filter with an approximate threshold first:
keep rows with hash < t where t bounds the k-th statistic from a
coarse per-partition bottom-k (`mapPartitions` local heaps union'd),
then run the exact window on the survivors — the filter drops
(1 - n/N) of the stratum map-side. The direct form below is the
correct plan whenever n × strata fits executor memory, which covers
sampling-for-eval at any corpus size.
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


def sample_hash_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`sample_hash` (same value, same key)."""
    from ..functions.hashing import affine_hash_sql

    return affine_hash_sql(f"CAST({key_expr} AS BIGINT)", str(SAMPLE_HASH_SEED))


__all__ = [
    "MERSENNE_P",
    "SAMPLE_HASH_SEED",
    "sample_bottomk_stratified",
    "sample_fraction",
    "sample_hash",
    "sample_hash_sql",
]
