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
import pandas as pd
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


_PLANE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def hyperplanes(dim: int, n_planes: int = 8, n_tables: int = 8) -> np.ndarray:
    """Deterministic hyperplanes, shape (n_tables * n_planes, dim).

    Entries are uniform in [-1, 1), derived from md5 of ``"{t}|{p}|{i}"``
    — a cross-engine-portable construction (DuckDB rebuilds the exact
    same matrix in SQL), so the LSH bucketing itself is oracle-checkable
    and no plane literals ever enter the Spark plan. Sign-projection LSH
    only needs a distribution symmetric around zero, so uniform works as
    well as Gaussian here. Cached per (dim, planes, tables) per process.
    """
    key = (dim, n_planes, n_tables)
    mat = _PLANE_CACHE.get(key)
    if mat is None:
        import hashlib

        vals = np.empty((n_tables * n_planes, dim), dtype=np.float64)
        for t in range(n_tables):
            for p in range(n_planes):
                for i in range(dim):
                    h = hashlib.md5(f"{t}|{p}|{i}".encode()).hexdigest()[:8]
                    vals[t * n_planes + p, i] = int(h, 16) / 2**31 - 1.0
        mat = _PLANE_CACHE[key] = vals
    return mat


def _bucket_udf(n_planes: int, n_tables: int):
    """Scalar pandas UDF: embedding -> array of per-table bucket strings.

    The plane matrix is a broadcast-sized numpy constant built lazily on
    the worker from the row dimensionality (no driver-side Spark action,
    no per-dimension literals in the plan); the projection is one
    vectorized ``X @ P.T`` per Arrow batch.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def buckets(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype=object)
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        P = hyperplanes(X.shape[1], n_planes, n_tables)
        bits = (X @ P.T >= 0).astype("<U1")  # '0'/'1' chars, (n, L*b)
        out = []
        for row in bits:
            s = "".join(row)
            out.append([s[t * n_planes : (t + 1) * n_planes] for t in range(n_tables)])
        return pd.Series(out)

    return buckets


def knn_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    top_k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH
    (OR-construction over ``n_tables`` independent hash tables), exact
    cosine re-rank over the unioned candidate set. Same output schema as
    ``knn_bruteforce``; recall is tuned by (n_planes, n_tables) — fewer
    planes / more tables raises recall at the cost of candidate volume.

    Scale shape: candidates come from a broadcast equi-join on
    (table, bucket) — never a cross product; the per-table collision
    rows carry only scalars into the dedup shuffle (vectors stay on the
    probe side of the broadcast join).
    """
    base = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))
    flat = base.select(
        "vid", "vec", "nrm",
        F.posexplode(_bucket_udf(n_planes, n_tables)(F.col("vec"))).alias(
            "tbl", "bucket"
        ),
    )
    q = flat.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
        F.col("tbl").alias("qtbl"),
        F.col("bucket").alias("qbucket"),
    )
    cand = flat.join(
        F.broadcast(q),
        (F.col("tbl") == F.col("qtbl"))
        & (F.col("bucket") == F.col("qbucket"))
        & (F.col("vid") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.round(
            _dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")), 4
        ).alias("cosine"),
    )
    # a pair colliding in several tables scores identically each time:
    # max() is pure dedup, and only scalar rows cross this shuffle
    dedup = scored.groupBy("query_id", "neighbor_id").agg(
        F.max("cosine").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )
