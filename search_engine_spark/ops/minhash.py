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


def neardup_pairs(
    docs_toks: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Verified near-dup pairs (docid_a, docid_b, jaccard).

    Exact shingle-set Jaccard computed ONLY on LSH candidates.
    """
    sig = minhash_signatures(docs_toks)
    cand = neardup_candidates(sig)
    sets_ = docs_toks.select(
        "docid", F.sort_array(shingles_col("toks")).alias("sh")
    )
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
