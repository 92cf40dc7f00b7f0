"""Distributed probabilistic sketches: HyperLogLog cardinality and
Count-Min frequency — DETERMINISTIC variants, so the DuckDB oracle can
recompute them hash-exactly.

Why sketches in a 100 TB pipeline: ``count(distinct term)`` (vocabulary
size) shuffles the full term universe; a heavy-hitter exact count
shuffles every (term) group.  The sketches below bound the shuffle at
a CONSTANT number of rows regardless of corpus size — HLL at
m = 2^p registers (after a map-side partial ``max``), CMS at
depth x width cells (after a map-side partial ``sum``) — which is the
textbook cardinality/frequency answer at cluster scale (Flajolet et
al. 2007, HyperLogLog; Cormode & Muthukrishnan 2005, Count-Min).

Determinism contract (shared with oracle/sqlgen_ops): the hash is the
repo's standard 60-bit md5 prefix (ops/minhash.shingle_base_hash —
``conv(substr(md5(x),1,15),16,10)`` / ``('0x'||substr(md5(x),1,15))::
BIGINT``), registers split h into ``idx = h % m`` and the remaining
48-bit window ``w = h // m`` whose rank is ``49 - bit_length(w)``
(``bit_length`` via ``length(bin(w))`` — identical minimal-digit
semantics in Spark and DuckDB, '0' for zero).  The HLL harmonic sum is
kept in INTEGER arithmetic (sum of 2^(49-rank), max 2^60 < int64) and
divided out in one fixed-order double expression, so there is no
float-sum order dependence anywhere — the estimates compare
bit-exactly across engines, partitionings and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 12                     # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 60 - HLL_P         # rank window width -> rank in [1, 49]
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA_EXPR = f"0.7213 / (1.0 + 1.079 / {HLL_M}.0)"

CMS_DEPTH = 4
CMS_WIDTH = 1 << 12


def _h60(col):
    """The repo's standard 60-bit md5-prefix hash (X2 discipline)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(
    items: DataFrame, item_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., idx, rank): the HLL register table.

    ``items`` may contain duplicates — max-aggregation absorbs them,
    which is the whole point (no distinct shuffle).  Partial (map-side)
    max means at most |groups| * m rows cross the wire.
    """
    h = _h60(F.col(item_col))
    # INTEGER shift, not `/` (double division would lose exactness
    # for h > 2^53); DuckDB twin uses `h >> p`
    w = F.shiftright(h, HLL_P)
    rank = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        items.withColumn("_idx", (h % F.lit(HLL_M)).cast("int"))
        .withColumn("_rank", rank.cast("int"))
        .groupBy(*group_cols, "_idx")
        .agg(F.max("_rank").alias("rank"))
        .withColumnRenamed("_idx", "idx")
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., est): the HLL cardinality estimate per group.

    Integer harmonic accumulator: isum = sum over PRESENT registers of
    2^(49 - rank); absent registers contribute 2^49 each (rank 0), so
    S = (isum + zeros * 2^49) / 2^49.  Small-range (linear counting)
    correction per the paper: E <= 2.5 m and zeros > 0 ->
    m * ln(m / zeros).  Every float step is a fixed-order scalar
    expression over integer aggregates — no order-dependent sums.
    """
    top = 1 << (HLL_WBITS + 1)  # 2^49 scale (absent register = 2^-0)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"cast(pow(2.0, {HLL_WBITS + 1} - rank) as bigint)"))
        .alias("isum"),
        F.count("*").alias("present"),
    )
    zeros = F.lit(HLL_M) - F.col("present")
    raw = (
        F.expr(HLL_ALPHA_EXPR)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        / (
            (F.col("isum").cast("double") + zeros.cast("double") * F.lit(float(top)))
            / F.lit(float(top))
        )
    )
    lin = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), lin
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 3).alias("est"))


def hll_cardinality(
    items: DataFrame, item_col: str, group_cols: list[str]
) -> DataFrame:
    """Composed register-build + estimate."""
    return hll_estimate(
        hll_registers(items, item_col, group_cols), group_cols
    )


def cms_sketch(items: DataFrame, item_col: str) -> DataFrame:
    """(j, bucket, cnt): the Count-Min table — depth rows per item via
    a posexplode over the salted hashes, then ONE partially-aggregated
    sum shuffle bounded at depth * width cells."""
    salted = F.array(
        *[
            _h60(F.concat(F.col(item_col), F.lit(f"#cms{j}")))
            % F.lit(CMS_WIDTH)
            for j in range(CMS_DEPTH)
        ]
    )
    return (
        items.select(F.posexplode(salted).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame, probes: list[str]
) -> DataFrame:
    """(term, est): min-over-depth point estimates for the probe
    terms.  est >= true count always; equality whenever no collision
    in at least one row — integers, so the oracle compare is exact.
    A probe hashing to an empty cell estimates 0 (the join is left,
    coalesced)."""
    spark = sketch.sparkSession
    pr = spark.createDataFrame([(t,) for t in probes], "term string")
    pj = pr.select(
        "term",
        F.posexplode(
            F.array(
                *[
                    _h60(F.concat(F.col("term"), F.lit(f"#cms{j}")))
                    % F.lit(CMS_WIDTH)
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("j", "bucket"),
    )
    return (
        pj.join(sketch, ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
