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

# bit value of `b`-th bit (b=0 is the MSB of the first hex nibble) of
# the md5-prefix hash of `term`
_BIT_EXPR = (
    "(shiftright(cast(conv(substring(md5(term), cast(b / 4 as int) + 1, 1),"
    " 16, 10) as int), 3 - cast(b % 4 as int)) & 1)"
)
# shiftleft(1L, 63) wraps to Long.MIN in Spark; that is the intended
# bit pattern for the MSB.
_WEIGHT_EXPR = "shiftleft(cast(1 as bigint), 63 - cast(b as int))"


def simhash_fingerprints(postings: DataFrame) -> DataFrame:
    """postings(term, docid, tf) -> (docid, simhash bigint)."""
    spark = postings.sparkSession
    terms = postings.select("term").distinct()
    bits = spark.range(64).select(F.col("id").cast("int").alias("b"))
    term_bits = terms.crossJoin(bits).withColumn("bit", F.expr(_BIT_EXPR))
    per_bit = (
        postings.join(term_bits, "term")
        .groupBy("docid", "b")
        .agg(F.sum(F.col("tf") * (2 * F.col("bit") - 1)).alias("s"))
    )
    return per_bit.groupBy("docid").agg(
        F.bit_or(
            F.when(F.col("s") > 0, F.expr(_WEIGHT_EXPR)).otherwise(F.lit(0))
        ).alias("simhash")
    )


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
