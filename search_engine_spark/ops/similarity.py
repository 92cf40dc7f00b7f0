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


def round5_col(col, digits: int = 5):
    """HALF_UP (away from zero) rounding via the shared float formula
    ``sign(x) * floor(|x| * 1e5 + 0.5) / 1e5`` — the SAME expression
    on the Spark, DuckDB (oracle/sqlgen_ops._round5) and pure-Python
    (ann_index._round_half_up) tiers, so boundary doubles cannot
    diverge between them (ADVICE r3 #2; same divergence class as the
    quality_score fix b95a41a: F.round rounds the decimal expansion,
    DuckDB/Python round the float product)."""
    s = float(10 ** digits)
    c = F.col(col) if isinstance(col, str) else col
    return F.signum(c) * F.floor(F.abs(c) * s + F.lit(0.5)) / F.lit(s)


def _first_vec(emb: DataFrame, vec_id: int):
    """The query vector, or KeyError if absent — matching the local
    serving twin ``AnnIndex._vec`` (ADVICE r3 #3)."""
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").first()
    if row is None:
        raise KeyError(f"vec_id {vec_id} not in index")
    return row["embedding"]


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
            round5_col("cosine").alias("cosine"),
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
            round5_col("cosine").alias("cosine"),
        )
    )


def sign_bucket_table(emb: DataFrame) -> DataFrame:
    """Materialized sign-LSH index: (vec_id, bucket), computed ONCE at
    index-build time (persist/write this).  The serving twin of
    ``ann_sign_lsh``'s generated bucket column — queries never re-hash
    the collection; candidates come from a bucket equi-probe.  Bucket
    membership is sign-exact (no float arithmetic crosses the
    driver/JVM boundary), so the candidate set is IDENTICAL to
    ``ann_sign_lsh`` by construction."""
    return emb.select(
        "vec_id", sign_bucket_col(F.col("embedding")).alias("bucket")
    )


def ann_sign_lsh_indexed(
    emb: DataFrame,
    bucket_table: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Sign-LSH ANN against the PRE-BUILT (vec_id, bucket) table — the
    serving shape: the query's bucket is computed on the driver from
    its vector (bit j set iff vec[j] > 0, exact), candidates are a
    pruned filter of the materialized index, and exact cosine (same
    JVM expression order as ``with_cosine``, query as a literal
    array) runs only on candidates.  Result is identical to
    ``ann_sign_lsh`` (contract-gated against the same DuckDB oracle);
    no per-query re-hash, no nested-loop join."""
    from search_engine_spark.ops.params import ANN_SIGN_DIMS as _DIMS

    qe = _first_vec(emb, query_vec_id)
    qb = sum(1 << j for j in range(_DIMS) if float(qe[j]) > 0)
    cand_ids = bucket_table.filter(
        (F.col("bucket") == qb) & (F.col("vec_id") != query_vec_id)
    ).select("vec_id")
    lit_q = F.array(*[F.lit(float(x)) for x in qe])
    a = _as_double(F.col("embedding"))
    scored = emb.join(cand_ids, "vec_id").withColumn(
        "cosine", dot_col(a, lit_q) / (norm2_col(a) * norm2_col(lit_q))
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            round5_col("cosine").alias("cosine"),
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
            round5_col("cosine").alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Real ANN geometry (pytest-gated at recall@10 >= 0.9 vs brute_topk;
# the simpler axis-sign / fixed-centroid variants above remain the
# oracle-reproducible contract entries).
# ---------------------------------------------------------------------------

def lsh_planes(dim: int = 64):
    """Seeded Gaussian hyperplanes, rounded to 6 dp so any twin
    (SQL literal or numpy) reproduces them bit-for-bit.
    Shape: (ANN_LSH_TABLES, ANN_LSH_BITS, dim)."""
    import numpy as np

    from search_engine_spark.ops.params import (
        ANN_LSH_BITS,
        ANN_LSH_SEED,
        ANN_LSH_TABLES,
    )

    rng = np.random.RandomState(ANN_LSH_SEED)
    return np.round(
        rng.standard_normal((ANN_LSH_TABLES, ANN_LSH_BITS, dim)), 6
    )


def _dot_lit(vec_col, plane):
    """dot(vec, literal plane) as a JVM higher-order expression."""
    lit = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(_as_double(vec_col), lit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _tagged_buckets_col(vec_col, planes):
    """array<int> of table-tagged sign-LSH buckets: entry t =
    t * 2^bits + bucket_t(vec); candidate pairs share ANY entry
    (arrays_overlap), i.e. match in at least one table."""
    n_tables, n_bits, _ = planes.shape
    out = []
    for t in range(n_tables):
        b = F.lit(0)
        for j in range(n_bits):
            b = b + F.when(
                _dot_lit(vec_col, planes[t][j]) > 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
        out.append((F.lit(t * (1 << n_bits)) + b).cast("int"))
    return F.array(*out)


def ann_rand_lsh(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Random-hyperplane sign-LSH ANN: ANN_LSH_TABLES independent
    tables of ANN_LSH_BITS Gaussian hyperplanes each; a vector is a
    candidate iff it shares the query's bucket in >= 1 table.  The
    plan shape at scale: tagged buckets are a generated column;
    candidate generation is an arrays_overlap semi-join against the
    broadcast query buckets (or an explode + equi-join on the tagged
    bucket for the shuffle form); exact cosine only on candidates."""
    planes = lsh_planes()
    tagged = emb.withColumn("tb", _tagged_buckets_col(F.col("embedding"), planes))
    q = tagged.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("tb").alias("qtb")
    )
    cand = tagged.crossJoin(F.broadcast(q)).filter(
        F.arrays_overlap("tb", "qtb") & (F.col("vec_id") != query_vec_id)
    )
    scored = with_cosine(cand, "embedding", "qe")
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            round5_col("cosine").alias("cosine"),
        )
    )


def lsh_bucket_table(emb: DataFrame) -> DataFrame:
    """The MATERIALIZED ANN index: (bucket, vec_id), one row per
    (table-tagged sign-LSH bucket, vector) — computed ONCE at index-
    build time (persist/write this), so queries never re-hash the
    collection.  The explode form of ann_rand_lsh's tagged array:
    candidates are recovered by a bucket equi-join, the shuffle-
    friendly shape at 100 TB (co-partition by bucket; a query probes
    ANN_LSH_TABLES buckets via broadcast)."""
    planes = lsh_planes()
    tagged = emb.withColumn(
        "tb", _tagged_buckets_col(F.col("embedding"), planes)
    )
    return tagged.select(
        "vec_id", F.explode("tb").alias("bucket")
    )


def query_buckets_py(vec, planes=None) -> list[int]:
    """Driver-side twin of ``_tagged_buckets_col`` for ONE query
    vector: float64 dot products accumulated left-to-right (the JVM
    ``aggregate`` order — bit-identical signs, so the bucket ids match
    the materialized index exactly)."""
    planes = planes if planes is not None else lsh_planes()
    n_tables, n_bits, _ = planes.shape
    v = [float(x) for x in vec]
    out = []
    for t in range(n_tables):
        b = 0
        for j in range(n_bits):
            acc = 0.0
            for x, y in zip(v, planes[t][j]):
                acc += x * float(y)
            if acc > 0:
                b += 1 << j
        out.append(t * (1 << n_bits) + b)
    return out


def ann_rand_lsh_indexed(
    emb: DataFrame,
    bucket_table: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Random-hyperplane LSH ANN against the PRE-BUILT bucket table —
    the serving shape: the query vector lives driver-side (one tiny
    lookup job), its ANN_LSH_TABLES bucket ids are computed on the
    driver (``query_buckets_py``), and candidates come from a pruned
    EQUI-join of those ids against the materialized (bucket, vec_id)
    index.  Exact cosine (same JVM zip_with/aggregate expression as
    ``ann_rand_lsh``, query as a literal array) only on candidates.
    No per-query re-hash of the collection, no nested-loop join
    (pinned by a plan-audit test); the candidate set — and therefore
    the recall-gated result — is IDENTICAL to ``ann_rand_lsh``."""
    qe = _first_vec(emb, query_vec_id)
    qb = query_buckets_py(qe)
    cand_ids = (
        bucket_table.filter(F.col("bucket").isin(qb))
        .select("vec_id")
        .distinct()
        .filter(F.col("vec_id") != query_vec_id)
    )
    lit_q = F.array(*[F.lit(float(x)) for x in qe])
    a = _as_double(F.col("embedding"))
    scored = (
        emb.join(cand_ids, "vec_id")
        .withColumn(
            "cosine", dot_col(a, lit_q) / (norm2_col(a) * norm2_col(lit_q))
        )
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            round5_col("cosine").alias("cosine"),
        )
    )


def kmeans_fit(emb: DataFrame, k: int | None = None, iters: int | None = None) -> DataFrame:
    """Lloyd's k-means as DataFrame ops (the same broadcast-join +
    groupBy loop as pagerank): assign = argmin L2 against broadcast
    centroids; update = per-(cid, dim) mean via posexplode.  Init =
    the k lowest vec_ids (deterministic).  Returns (cid, ce).

    Scale: each iteration shuffles n*dim (docid, pos, val) rows with
    map-side partial means — the standard distributed k-means shape;
    centroids stay driver-small and broadcast."""
    from search_engine_spark.ops.params import IVF_KMEANS_ITERS, IVF_KMEANS_K

    k = k or IVF_KMEANS_K
    iters = iters if iters is not None else IVF_KMEANS_ITERS
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cid"),
        _as_double(F.col("embedding")).alias("ce"),
    )
    for _ in range(iters):
        assigned = _assign(emb, cent)
        new = (
            assigned.select(
                "cid", F.posexplode(_as_double(F.col("embedding")))
            )
            .groupBy("cid", "pos")
            .agg(F.avg("col").alias("v"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("ce")
            )
        )
        # empty clusters keep their previous centroid
        cent = new.unionByName(
            cent.join(new.select("cid"), "cid", "left_anti")
        ).localCheckpoint(eager=True)
    return cent


def _assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    a = _as_double(F.col("embedding"))
    c = F.col("ce")
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


def ann_ivf_trained(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    probes: int | None = None,
    cent: DataFrame | None = None,
) -> DataFrame:
    """IVF over a k-means-trained codebook: assign all vectors to the
    trained centroids, probe the closest `probes` lists, exact cosine
    on the shortlist only."""
    from search_engine_spark.ops.params import IVF_TRAINED_PROBES

    probes = probes or IVF_TRAINED_PROBES
    cent = cent if cent is not None else kmeans_fit(emb)
    assigned = _assign(emb, cent)
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe")
    )
    qd = _as_double(F.col("qe"))
    d2 = F.aggregate(
        F.zip_with(qd, F.col("ce"), lambda x, y: (x - y) * (x - y)),
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
            round5_col("cosine").alias("cosine"),
        )
    )


def ann_ivf_indexed(
    emb: DataFrame,
    assigned: DataFrame,
    cent_rows: list[tuple[int, list[float]]],
    query_vec_id: int = 0,
    k: int = 10,
    probes: int | None = None,
) -> DataFrame:
    """IVF ANN against MATERIALIZED state — the serving shape of
    ``ann_ivf_trained``: ``assigned`` is the pre-built (vec_id,
    embedding, cid) assignment table (persist/write at index time),
    ``cent_rows`` the driver-resident codebook [(cid, centroid)].
    Probe selection runs on the driver (L2 left-to-right float64
    accumulation — the JVM ``aggregate`` order, ties by cid, matching
    ``ann_ivf_trained``'s probe choice exactly); candidates come from
    a cid-pruned filter of the assignment table; exact cosine (query
    as a literal array) only on the shortlist.  No per-query
    reassignment of the collection, no nested-loop join."""
    from search_engine_spark.ops.params import IVF_TRAINED_PROBES

    probes = probes or IVF_TRAINED_PROBES
    qe = _first_vec(emb, query_vec_id)
    qv = [float(x) for x in qe]
    dists = []
    for cid, ce in cent_rows:
        acc = 0.0
        for x, y in zip(qv, ce):
            d = x - float(y)
            acc += d * d
        dists.append((acc, int(cid)))
    dists.sort()
    probe_cids = [cid for _d, cid in dists[:probes]]
    lit_q = F.array(*[F.lit(x) for x in qv])
    a = _as_double(F.col("embedding"))
    scored = (
        assigned.filter(
            F.col("cid").isin(probe_cids)
            & (F.col("vec_id") != query_vec_id)
        )
        .withColumn(
            "cosine", dot_col(a, lit_q) / (norm2_col(a) * norm2_col(lit_q))
        )
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            round5_col("cosine").alias("cosine"),
        )
    )


def doc_cosine_neardup(
    docs_toks: DataFrame,
    postings: DataFrame,
    threshold: float | None = None,
    dims: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over DOCUMENTS: each doc
    becomes a DOC_EMBED_DIMS-dim token-hash count vector (dim =
    md5-60bit(term) % dims, value = summed tf); candidate pairs come
    from the MinHash LSH bands (never all-pairs); exact cosine is
    verified ONLY on candidates via a sparse per-dim join — vectors
    are never materialized as arrays, so the same plan runs at 100 TB.

    Counts are small integers, so dot products and norms are exact in
    float64 and the DuckDB twin matches bit-for-bit before rounding.
    """
    from search_engine_spark.ops import minhash
    from search_engine_spark.ops.params import (
        DOC_COSINE_DUP_THRESHOLD,
        DOC_EMBED_DIMS,
    )

    threshold = threshold if threshold is not None else DOC_COSINE_DUP_THRESHOLD
    dims = dims or DOC_EMBED_DIMS
    cand = minhash.neardup_candidates(
        minhash.minhash_signatures(docs_toks)
    )
    vec = (
        postings.withColumn(
            "dim",
            (minhash.shingle_base_hash(F.col("term")) % dims).cast("int"),
        )
        .groupBy("docid", "dim")
        .agg(F.sum("tf").cast("double").alias("v"))
    )
    norms = vec.groupBy("docid").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    a = vec.select(F.col("docid").alias("docid_a"), "dim", F.col("v").alias("va"))
    b = vec.select(F.col("docid").alias("docid_b"), "dim", F.col("v").alias("vb"))
    dots = (
        cand.join(a, "docid_a")
        .join(b, ["docid_b", "dim"])
        .groupBy("docid_a", "docid_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("docid").alias("docid_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("docid").alias("docid_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "docid_a")
        .join(nb, "docid_b")
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("docid_a").cast("long").alias("docid_a"),
            F.col("docid_b").cast("long").alias("docid_b"),
            round5_col("cosine").alias("cosine"),
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
            round5_col("cosine").alias("cosine"),
        )
    )
