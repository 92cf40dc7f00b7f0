"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k (the exactness baseline),
- sign-LSH bucketed ANN (axis-aligned hyperplanes over the first 8
  dims — cheap, deterministic, oracle-reproducible),
- IVF-style ANN (fixed coarse centroids = first 16 vectors; assign by
  L2, probe the closest 2 lists),
- cosine near-duplicate pairs within sign-LSH buckets.

Dot products are computed with ``zip_with``/``aggregate`` JVM
higher-order functions in index order (cast to double first), so the
DuckDB oracle — which sums in the same index order — matches to the
last few ulps; outputs are rounded for hash-stable comparison.

At 100 TB scale the bucketed variants are the real path: candidates
co-partition by bucket/centroid, so the pairwise work is
O(candidates), never O(N) per query — and the same plan shape
(broadcast the probe set, shuffle by bucket) holds on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.params import (
    ANN_SIGN_DIMS,
    COSINE_DUP_THRESHOLD,
    IVF_CENTROIDS,
    IVF_PROBES,
)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2_col(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def with_cosine(df: DataFrame, vec_a: str, vec_b: str) -> DataFrame:
    a = _as_double(F.col(vec_a))
    b = _as_double(F.col(vec_b))
    return df.withColumn("cosine", dot_col(a, b) / (norm2_col(a) * norm2_col(b)))


def sign_bucket_col(vec, dims: int = ANN_SIGN_DIMS):
    """Sign-LSH bucket: bit j set iff vec[j] > 0 (first `dims` dims)."""
    b = F.lit(0)
    for j in range(dims):
        b = b + F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return b.cast("int")


def brute_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact cosine top-k vs the vector with id `query_vec_id`."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    scored = with_cosine(
        emb.filter(F.col("vec_id") != query_vec_id).crossJoin(F.broadcast(q)),
        "embedding",
        "qe",
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round("cosine", 5).alias("cosine"),
        )
    )


def ann_sign_lsh(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket."""
    bucketed = emb.withColumn("bucket", sign_bucket_col(F.col("embedding")))
    q = bucketed.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    cand = bucketed.join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    ).filter(F.col("vec_id") != query_vec_id)
    scored = with_cosine(cand, "embedding", "qe")
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round("cosine", 5).alias("cosine"),
        )
    )


def ivf_assignments(emb: DataFrame, n_centroids: int = IVF_CENTROIDS) -> DataFrame:
    """Assign every vector to its nearest (L2) coarse centroid.

    Centroids are the vectors with vec_id 0..n_centroids-1 (fixed,
    deterministic — a stand-in for a k-means codebook)."""
    cent = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    a = _as_double(F.col("embedding"))
    c = _as_double(F.col("ce"))
    d2 = F.aggregate(
        F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
    return (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", "cid")
    )


def ann_ivf(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    probes: int = IVF_PROBES,
) -> DataFrame:
    """IVF probe search: scan only the `probes` closest centroid lists."""
    assigned = ivf_assignments(emb)
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    cent = emb.filter(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    qd = _as_double(F.col("qe"))
    cd = _as_double(F.col("ce"))
    d2 = F.aggregate(
        F.zip_with(qd, cd, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_cids = (
        cent.crossJoin(F.broadcast(q))
        .withColumn("d2", d2)
        .orderBy(F.asc("d2"), F.asc("cid"))
        .limit(probes)
        .select("cid")
    )
    cand = assigned.join(F.broadcast(probe_cids), "cid").filter(
        F.col("vec_id") != query_vec_id
    )
    scored = with_cosine(cand.crossJoin(F.broadcast(q)), "embedding", "qe")
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round("cosine", 5).alias("cosine"),
        )
    )


def cosine_neardup_pairs(
    emb: DataFrame, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """Near-dup pairs (cosine >= threshold) within sign-LSH buckets."""
    b = emb.withColumn("bucket", sign_bucket_col(F.col("embedding")))
    a = b.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    c = b.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket"
    )
    pairs = a.join(c, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    scored = with_cosine(pairs, "ea", "eb")
    return (
        scored.filter(F.col("cosine") >= threshold)
        .select(
            F.col("vec_a").cast("long").alias("vec_a"),
            F.col("vec_b").cast("long").alias("vec_b"),
            F.round("cosine", 5).alias("cosine"),
        )
    )
