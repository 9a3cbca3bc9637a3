"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension: approximate-nearest-neighbor over the
``embeddings`` table. Two paths:

- ``brute_force_topk`` — exact cosine top-k; the correctness baseline.
  The dot product is a codegen'd sequential fold over the array
  (zip_with + aggregate) — JVM-side, no UDF, and bit-deterministic so
  the oracle reproduces it exactly.
- ``lsh_topk`` — random-hyperplane LSH (Charikar 2002): bucket vectors
  by the sign pattern of P hyperplane projections, then search only
  within the query's bucket. The hyperplanes are integer-derived
  constants, so bucketing is deterministic. At 100 TB scale the bucket
  join replaces the O(Q×N) cross join with O(Q×N/2^P) per-bucket work;
  the cross join here is the small-Q verification shape.

Cosine-threshold near-dup (``cosine_pairs``) is the embedding member of
the dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_PLANES = 8


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic, codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0).cast("double"), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize once so downstream cosine is a plain dot product —
    at scale this halves the per-pair flops and is done in the scan
    projection, before any shuffle."""
    v = _to_double(F.col(vec_col))
    n = norm2(v)
    return df.withColumn("unit", F.transform(v, lambda x: x / n))


def cosine_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", threshold: float = 0.4
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ threshold. Cross-join
    verification kernel (LSH buckets are the scale path)."""
    a = emb.select(F.col(id_col).alias("vec_a"), _to_double(F.col(vec_col)).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), _to_double(F.col(vec_col)).alias("vb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).withColumn(
        "cos", cosine(F.col("va"), F.col("vb"))
    )
    return pairs.filter(F.col("cos") >= threshold).select("vec_a", "vec_b", "cos")


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the given query vectors: broadcast the Q
    queries against the corpus (map-side — the corpus never shuffles),
    then per-query top-k via window."""
    base = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v"))
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    scored = base.join(F.broadcast(queries), F.col(id_col) != F.col("query_id")).withColumn(
        "cos", cosine(F.col("qv"), F.col("v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos", "rank")
    )


def hyperplane(j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: integer-derived weights in
    {-3..3} (no transcendental functions → engine-portable)."""
    return [float((i * 31 + j * 17) % 7 - 3) for i in range(dim)]


def lsh_bucket(vec: Column, dim: int, planes: int = LSH_PLANES) -> Column:
    """Sign-pattern bucket id: bit j set iff dot(v, h_j) > 0."""
    bucket = F.lit(0).cast("bigint")
    for j in range(planes):
        h = F.array(*[F.lit(w) for w in hyperplane(j, dim)])
        bucket = bucket + F.when(dot(vec, h) > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket: the corpus is
    bucketed once (a scan-side projection), queries join on bucket —
    an equi-join whose per-bucket fan-out is ~N/2^P. Recall is traded
    for the 2^P search-space reduction (multi-probe would widen it)."""
    base = emb.select(F.col(id_col), _to_double(F.col(vec_col)).alias("v")).withColumn(
        "bucket", lsh_bucket(F.col("v"), dim)
    )
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("bucket")
    )
    scored = base.join(F.broadcast(queries), "bucket").filter(
        F.col(id_col) != F.col("query_id")
    ).withColumn("cos", cosine(F.col("qv"), F.col("v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "bucket", "cos", "rank")
    )
