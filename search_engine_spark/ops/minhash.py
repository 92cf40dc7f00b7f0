"""MinHash + LSH near-duplicate detection over token shingles.

The scale path for n-gram Jaccard dedup: shingle -> 16 affine minhash
functions over a 60-bit md5-prefix base hash -> 4 bands x 4 rows ->
band-bucket equi-self-join -> exact Jaccard verification on the
candidates only (never O(N^2)).

All arithmetic stays in int64 with MOD 1e9+7 (params.py) so the
DuckDB oracle (sqlgen.py) reproduces every signature bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.params import (
    JACCARD_THRESHOLD,
    MINHASH_A,
    MINHASH_B,
    MINHASH_K,
    MINHASH_PRIME,
    MINHASH_ROWS,
    SHINGLE_N,
)

_P = MINHASH_PRIME


def shingles_col(toks_col: str = "toks", n: int = SHINGLE_N):
    """Array of distinct n-gram shingles (space-joined token windows).

    Docs shorter than n tokens produce one whole-doc shingle."""
    return F.expr(
        f"array_distinct(CASE WHEN size({toks_col}) < {n} "
        f"THEN array(concat_ws(' ', {toks_col})) "
        f"ELSE transform(sequence(0, size({toks_col}) - {n}), "
        f"i -> concat_ws(' ', slice({toks_col}, i + 1, {n}))) END)"
    )


def shingle_base_hash(shingle_col):
    """60-bit base hash: first 15 hex chars of md5 (int64-safe)."""
    return F.conv(F.substring(F.md5(shingle_col), 1, 15), 16, 10).cast("long")


def _seeds_df(spark):
    rows = [
        (i, MINHASH_A[i], MINHASH_B[i], 31 ** (i % MINHASH_ROWS))
        for i in range(MINHASH_K)
    ]
    return spark.createDataFrame(
        rows, "i int, a bigint, b bigint, pow31 bigint"
    )


def minhash_signatures(docs_toks: DataFrame) -> DataFrame:
    """(docid, toks) -> signature rows (docid, i, minhash)."""
    spark = docs_toks.sparkSession
    sh = docs_toks.select(
        "docid", F.explode(shingles_col("toks")).alias("shingle")
    ).withColumn("hm", shingle_base_hash(F.col("shingle")) % _P)
    seeds = _seeds_df(spark)
    return (
        sh.crossJoin(F.broadcast(seeds))
        .withColumn("hi", (F.col("a") * F.col("hm") + F.col("b")) % _P)
        .groupBy("docid", "i")
        .agg(F.min("hi").alias("minhash"))
    )


def lsh_bands(sig: DataFrame) -> DataFrame:
    """Signature rows -> (docid, band, band_val)."""
    return (
        sig.withColumn("band", (F.col("i") / MINHASH_ROWS).cast("int"))
        .withColumn(
            "pow31",
            F.pow(F.lit(31.0), (F.col("i") % MINHASH_ROWS)).cast("long"),
        )
        .groupBy("docid", "band")
        .agg(
            (F.sum(F.col("minhash") % _P * F.col("pow31")) % _P).alias(
                "band_val"
            )
        )
    )


def neardup_candidates(sig: DataFrame) -> DataFrame:
    """LSH candidates (docid_a < docid_b), deduped across bands."""
    b = lsh_bands(sig)
    a = b.select(F.col("docid").alias("docid_a"), "band", "band_val")
    c = b.select(F.col("docid").alias("docid_b"), "band", "band_val")
    return (
        a.join(c, ["band", "band_val"])
        .filter(F.col("docid_a") < F.col("docid_b"))
        .select("docid_a", "docid_b")
        .distinct()
    )


def shingle_hash_sets(docs_toks: DataFrame) -> DataFrame:
    """(docid, sh): sorted distinct 60-bit shingle hashes per doc.

    The exact-verify join's payload: int64 hashes instead of the
    shingle STRINGS — avg_shingle_bytes/8 smaller per candidate side
    (measured 2.0x on the sf0.1 fixture corpus, more on real code
    where 3-token shingles run longer; BENCH/minhash_verify.jsonl).
    Set Jaccard over the hashes equals the
    string-set Jaccard unless two distinct shingles collide in the
    60-bit md5-prefix space (~n^2/2^61 per doc pair)."""
    return docs_toks.select(
        "docid",
        F.sort_array(
            F.array_distinct(
                F.transform(shingles_col("toks"), shingle_base_hash)
            )
        ).alias("sh"),
    )


def neardup_pairs(
    docs_toks: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    verify: str = "exact",
) -> DataFrame:
    """Verified near-dup pairs (docid_a, docid_b, jaccard).

    verify="exact" (default): exact shingle-set Jaccard computed ONLY
    on LSH candidates, over 60-bit hash sets (see shingle_hash_sets).

    verify="estimate": signature-level fallback — jaccard is estimated
    as the fraction of the MINHASH_K signature components that agree,
    so nothing heavier than the 16-component signatures ever ships.
    Use when a pathological band value explodes the candidate count
    (e.g. a boilerplate shingle shared corpus-wide) and shipping even
    hashed sets per candidate would dominate the shuffle; the estimate
    is unbiased with std ~= sqrt(J(1-J)/K)."""
    sig = minhash_signatures(docs_toks)
    cand = neardup_candidates(sig)
    if verify == "estimate":
        sa = sig.select(
            F.col("docid").alias("docid_a"), "i", F.col("minhash").alias("mh_a")
        )
        sb = sig.select(
            F.col("docid").alias("docid_b"), "i", F.col("minhash").alias("mh_b")
        )
        return (
            cand.join(sa, "docid_a")
            .join(sb, ["docid_b", "i"])
            .groupBy("docid_a", "docid_b")
            .agg(
                (
                    F.sum((F.col("mh_a") == F.col("mh_b")).cast("int"))
                    / F.lit(MINHASH_K)
                ).alias("jaccard")
            )
            .filter(F.col("jaccard") >= threshold)
            .select(
                "docid_a", "docid_b", F.round("jaccard", 5).alias("jaccard")
            )
        )
    if verify != "exact":
        raise ValueError(f"verify must be 'exact' or 'estimate': {verify}")
    sets_ = shingle_hash_sets(docs_toks)
    return (
        cand.join(sets_.withColumnRenamed("docid", "docid_a").withColumnRenamed("sh", "sh_a"), "docid_a")
        .join(sets_.withColumnRenamed("docid", "docid_b").withColumnRenamed("sh", "sh_b"), "docid_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("docid_a", "docid_b", F.round("jaccard", 5).alias("jaccard"))
    )
