"""Similarity search over an embedding column (array<float>).

- ``knn_bruteforce``: exact cosine top-k — broadcast the (small) query
  set against the corpus; the dot product runs JVM-side via zip_with +
  aggregate (no Python), one shuffle for the per-query top-k window.
- ``knn_lsh``: the scale path — random-hyperplane LSH bucketing
  (deterministic seeded planes); candidates share a bucket, exact cosine
  re-rank inside the bucket. At 10^12 rows the bucket join replaces the
  full cross product; recall is tunable by planes/tables.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def knn_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the given query ids against all other rows.

    Result: (query_id, neighbor_id, rank, cosine) — cosine rounded to 4
    decimals; ties broken by neighbor_id for determinism.
    """
    base = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("vec")
    ).withColumn("nrm", _norm(F.col("vec")))
    q = base.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    joined = base.crossJoin(F.broadcast(q)).where(F.col("vid") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.round(
            _dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")), 4
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = SEED) -> np.ndarray:
    """Deterministic random hyperplanes (public LSH construction)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Bucket id = sign-bit string of the hyperplane projections,
    computed JVM-side: each projection is a zip_with/aggregate dot
    product against a literal plane array."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(float(x)) for x in row])
        bits.append(F.when(_dot(vec_col, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def knn_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    top_k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signs, exact re-rank within
    the query's bucket. Same output schema as ``knn_bruteforce`` (plus
    only-bucket-local neighbors)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    base = (
        embeddings.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
        .withColumn("nrm", _norm(F.col("vec")))
        .withColumn("bucket", lsh_bucket_col(F.col("vec"), planes))
    )
    q = base.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    joined = base.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vid") != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.round(
            _dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")), 4
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
