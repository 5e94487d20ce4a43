"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk: exact cosine top-k — the correctness baseline; the
  query side is broadcast, the corpus side streams, ranking is a
  per-query window (TakeOrdered shape). O(Q × N) but one scan of N.
- lsh_topk: random-hyperplane LSH bucketing + exact rerank within probed
  buckets — the 100 TB scale path. Hyperplanes are derived from the
  md5-based h60 hash so the index is deterministic (no RNG state), and
  bucket ids are computed per row with no shuffle; only the candidate
  rerank joins. Approximate (recall < 1) → no SQL oracle; the driver
  records the rows-only check, and tests measure recall against the
  brute-force baseline instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from orientdb_spark.pipeline.common import cosine_similarity, h60


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cosine, rank), self-matches excluded,
    ties broken by neighbor id (deterministic for the oracle).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component from the shared
    60-bit hash family — reproducible across runs/engines, no RNG."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"plane:{plane}:{j}".encode()).hexdigest()[:15], 16)
        out.append((h / float(1 << 60)) * 2.0 - 1.0)
    return out


def lsh_bucket_col(vec: Column, dim: int, planes: int) -> Column:
    """Random-hyperplane signature: bit p = sign(v · plane_p)."""
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        coeffs = _hyperplane(dim, p)
        dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(c) for c in coeffs]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine rerank within candidates. Same output shape as
    brute_force_topk; recall measured in tests."""
    bucket = lsh_bucket_col(F.col(vec_col), dim, planes)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"), bucket.alias("__b")
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), bucket.alias("__b")
    )
    scored = (
        F.broadcast(q)
        .join(c, "__b")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_similarity(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
