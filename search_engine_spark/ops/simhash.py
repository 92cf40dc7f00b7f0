"""SimHash near-duplicate detection (reference parity).

Semantics from the reference (SURVEY.md A10/X2-X4/J3):
- per-token 64-bit hash = first 8 bytes of MD5 (big-endian), i.e. the
  first 16 hex chars of the digest (SimHashService.java:106-122),
- per-doc: sum +/-1 per bit position weighted by term frequency, sign
  -> fingerprint bit (SimHashService.java:28-61),
- near-dup when Hamming distance <= 3 (SimHashService.java:23),
- candidate generation via 4 x 16-bit LSH bands instead of the
  reference's O(N^2) scan (its own docs propose exactly this:
  docs/advanced-deep-dive.md:349-390).

Implementation is pure JVM column math (no Python in the hot path):
distinct terms are hashed once (64 rows per term via an exploded bit
index), joined back to postings, partially aggregated per (docid,
bit).  Everything is expressible in DuckDB too — sqlgen.py emits the
oracle twin with identical constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.params import (
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_HAMMING_THRESHOLD,
)

# The term's 64-bit hash = first 8 bytes of MD5, big-endian (first 16
# hex chars), assembled from two 32-bit halves; shiftleft wraps into
# the sign bit, producing exactly the intended two's-complement
# pattern.  Bit j (j=0 = MSB of the first hex nibble) is then
# (h >> (63-j)) & 1 — arithmetic shift is fine because of the mask.
_HASH64_EXPR = (
    "shiftleft(cast(conv(substring(md5(term), 1, 8), 16, 10) as bigint), 32)"
    " | cast(conv(substring(md5(term), 9, 8), 16, 10) as bigint)"
)


def simhash_fingerprints(postings: DataFrame) -> DataFrame:
    """postings(term, docid, tf) -> (docid, simhash bigint).

    Scale shape: each DISTINCT term is hashed ONCE to a packed int64;
    postings join that 1-row-per-term table (no row blowup), and the
    64 per-bit weighted sums fold in a single groupBy(docid) with 64
    JVM aggregate columns — map-side combine leaves one 65-column row
    per doc per task on the shuffle, ~64x less than the exploded
    per-bit layout.  Pure column math; the DuckDB oracle
    (sqlgen_ops._simhash_fp_cte) is the unchanged semantic twin.
    """
    terms = postings.select("term").distinct().withColumn(
        "h", F.expr(_HASH64_EXPR)
    )
    joined = postings.join(terms, "term")
    sums = joined.groupBy("docid").agg(
        *[
            F.sum(
                F.col("tf")
                * (2 * F.expr(f"(shiftright(h, {63 - j}) & 1)") - 1)
            ).alias(f"s{j}")
            for j in range(64)
        ]
    )
    fp = " | ".join(
        f"(CASE WHEN s{j} > 0 THEN "
        f"shiftleft(cast(1 as bigint), {63 - j}) ELSE cast(0 as bigint) END)"
        for j in range(64)
    )
    return sums.select("docid", F.expr(fp).alias("simhash"))


def simhash_bands(fp: DataFrame) -> DataFrame:
    """(docid, simhash) -> (docid, simhash, band, band_val)."""
    spark = fp.sparkSession
    bands = spark.range(SIMHASH_BANDS).select(
        F.col("id").cast("int").alias("band")
    )
    return fp.crossJoin(bands).withColumn(
        "band_val",
        F.expr(
            f"shiftright(simhash, band * {SIMHASH_BAND_BITS})"
            f" & {(1 << SIMHASH_BAND_BITS) - 1}"
        ),
    )


def neardup_pairs(
    fp: DataFrame, threshold: int = SIMHASH_HAMMING_THRESHOLD
) -> DataFrame:
    """LSH band self-join -> verified pairs (docid_a, docid_b, hamming).

    The J3 operator: equi-join candidates on (band, band_val), theta
    post-filter bit_count(xor) <= threshold, dedup across bands.
    """
    b = simhash_bands(fp)
    a = b.select(
        F.col("docid").alias("docid_a"),
        F.col("simhash").alias("sim_a"),
        "band",
        "band_val",
    )
    c = b.select(
        F.col("docid").alias("docid_b"),
        F.col("simhash").alias("sim_b"),
        "band",
        "band_val",
    )
    pairs = (
        a.join(c, ["band", "band_val"])
        .filter(F.col("docid_a") < F.col("docid_b"))
        .select("docid_a", "docid_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming",
            F.expr("bit_count(sim_a ^ sim_b)").cast("int"),
        )
        .filter(F.col("hamming") <= threshold)
        .select("docid_a", "docid_b", "hamming")
    )
    return pairs


def similarity_pct(hamming_col):
    """X4: similarity % = (1 - dist/64) * 100 (SimHashService.java:89-92)."""
    return (1.0 - hamming_col / 64.0) * 100.0
