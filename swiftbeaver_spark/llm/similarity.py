"""Similarity search over embedding columns (array<float>).

- cosine_similarity / dot: JVM-side zip_with + aggregate (index-ordered
  fold — deterministic float results independent of partitioning)
- brute_force_topk: broadcast queries x corpus, window rank — the exact
  baseline; one shuffle of k rows per query
- hyperplane_bucket: deterministic random-hyperplane LSH (signs derived
  from xxhash64, no RNG state to ship) — the scale path; probing
  neighboring buckets trades recall for cost

Scale: brute force is O(corpus x queries) but embarrassingly parallel
and broadcast-friendly for <= thousands of queries; LSH buckets cut the
candidate set by ~2^planes. Both keep vectors as columnar arrays —
Tungsten handles them off-heap; nothing crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set, rank per
    query. Ties broken by corpus id for determinism."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("query_vec"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine_similarity(F.col("vec"), F.col("query_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _plane_component(plane: Column, j: Column) -> Column:
    """Deterministic ±1 hyperplane component from xxhash64('plane', p, j)."""
    h = F.xxhash64(F.lit("plane"), plane, j)
    return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def md5_plane_matrix(num_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplane matrix derived from md5('plane:p:j') — a constant
    both engines (and any SQL oracle) can reproduce or inline verbatim."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"plane:{p}:{j}".encode()).digest()[0] & 1 else -1.0
            for j in range(dim)
        ]
        for p in range(num_planes)
    ]


def hyperplane_bucket(
    vec: Column,
    num_planes: int = 8,
    plane_matrix: list[list[float]] | None = None,
) -> Column:
    """Sign-pattern bucket id over `num_planes` hyperplanes.

    Default: hash-derived components (xxhash64, no RNG state to ship).
    With `plane_matrix`: explicit ±1 literals unrolled into the plan —
    a strict left-to-right fold (0.0 + v1*c1 + ... + vn*cn) whose IEEE
    result any engine can replicate bit-for-bit for oracle checks.
    All arithmetic in codegen either way."""
    if plane_matrix is not None:
        bucket = F.lit(0)
        for p, row in enumerate(plane_matrix):
            s = F.lit(0.0)
            for j, c in enumerate(row):
                s = s + F.element_at(vec, j + 1) * F.lit(c)
            bucket = bucket + F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return bucket
    signs = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.size(vec) - 1),
                    lambda v, j: v * _plane_component(p, j),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        F.zip_with(
            signs,
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            lambda s, p: s * F.call_function("shiftleft", F.lit(1), p),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    plane_matrix: list[list[float]] | None = None,
    round_cosine: int | None = None,
) -> DataFrame:
    """Approximate top-k: only score corpus vectors in the query's LSH
    bucket. Recall < 1; cost ~ corpus/2^planes per query.

    `plane_matrix` pins the hyperplanes to explicit constants (see
    hyperplane_bucket); `round_cosine` ranks on a dp-rounded cosine for
    cross-engine float stability in oracle comparisons."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("bucket", hyperplane_bucket(F.col("vec"), num_planes, plane_matrix))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("query_vec"),
    ).withColumn("bucket", hyperplane_bucket(F.col("query_vec"), num_planes, plane_matrix))
    cos = cosine_similarity(F.col("vec"), F.col("query_vec"))
    if round_cosine is not None:
        cos = F.round(cos, round_cosine)
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "vec_id",
        cos.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
