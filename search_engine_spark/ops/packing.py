"""Sequence packing for LLM pretraining pipelines.

The standard GPT-style packing: concatenate every document's tokens
into one global stream (in docid order) and split it into fixed-size
training examples of ``context_len`` tokens; documents cross example
boundaries, the final example may be short.  Together with
ops/chunking.py (windowed splits that respect document boundaries)
this covers both packing disciplines real pipelines use.

Scale design — the global prefix sum is the whole problem here, and
``Window.orderBy`` without a partition key (the naive spelling) is a
single-task serialization that dies long before 100 TB.  Instead the
stream offset is a two-phase distributed prefix sum over
DETERMINISTIC docid-range buckets (``bucket = docid * nb // (max+1)``
— a monotone pure function of docid, so unlike
``repartitionByRange``'s *sampled* boundaries it is reproducible
across the two jobs that must agree on it):

1. per-bucket token totals via one aggregate, collected — ``nb``
   driver rows, never proportional to data — and turned into
   exclusive bucket offsets;
2. per-bucket exclusive cumsum via ``groupBy(bucket).applyInPandas``
   (each bucket sorts its rows by docid and adds its offset) — one
   shuffle, per-task memory bounded by one bucket, the same contract
   as any task partition.

After that each document's global start is known and the example
fan-out is pure column arithmetic: a doc spanning examples
``e0 = gstart // N`` .. ``e1 = (gstart + n - 1) // N`` explodes into
its per-example piece via ``slice``; one ``groupBy(example_id)``
(the output key — an unavoidable, perfectly balanced shuffle, since
every example is exactly N tokens) assembles the ordered pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_examples(
    docs: DataFrame,
    *,
    context_len: int = 128,
    id_col: str = "docid",
    toks_col: str = "toks",
    num_buckets: int | None = None,
) -> DataFrame:
    """(id, toks array) -> one row per packed training example:
    (example_id, n_tokens, n_docs, text).  ``text`` is the example's
    tokens joined with single spaces; ``n_docs`` counts the distinct
    documents contributing.  Examples are exactly ``context_len``
    tokens except possibly the last; the concatenation of all
    examples equals the concatenation of all documents' tokens in
    ``id_col`` order."""
    if not isinstance(context_len, int) or context_len <= 0:
        raise ValueError(
            f"context_len must be a positive int, got {context_len!r}")
    spark = docs.sparkSession
    nb = num_buckets or spark.sparkContext.defaultParallelism

    base = docs.select(
        F.col(id_col).cast("long").alias("docid"),
        F.col(toks_col).alias("toks"),
    ).filter(F.size("toks") > 0)

    bounds = base.agg(F.max("docid").alias("mx")).collect()[0]
    if bounds["mx"] is None:  # empty corpus -> no examples
        return spark.createDataFrame(
            [], "example_id long, n_tokens int, n_docs int, text string"
        )
    span = int(bounds["mx"]) + 1
    bucket = (F.col("docid") * nb / span).cast("long")
    b = base.withColumn("bucket", bucket)

    # phase 1: per-bucket totals -> exclusive offsets (nb driver rows)
    totals = (
        b.groupBy("bucket").agg(F.sum(F.size("toks")).alias("tot"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["bucket"]):
        offsets[int(r["bucket"])] = acc
        acc += int(r["tot"])
    offsets_bc = spark.sparkContext.broadcast(offsets)

    # phase 2: exclusive cumsum inside each docid-sorted bucket
    def bucket_cumsum(key, pdf):
        pdf = pdf.sort_values("docid").reset_index(drop=True)
        ns = pdf["toks"].map(len)
        pdf["n"] = ns.astype("int32")
        pdf["gstart"] = (
            ns.cumsum() - ns + offsets_bc.value[int(key[0])]
        ).astype("int64")
        return pdf[["docid", "toks", "n", "gstart"]]

    g = b.groupBy("bucket").applyInPandas(
        bucket_cumsum,
        schema="docid long, toks array<string>, n int, gstart long",
    )

    # fan out each doc to the examples it spans; slice its piece
    nl = F.lit(context_len).cast("long")
    e0 = (F.col("gstart") / nl).cast("long")
    e1 = ((F.col("gstart") + F.col("n") - 1) / nl).cast("long")
    exploded = g.select(
        "docid", "toks", "n", "gstart",
        F.explode(F.sequence(e0, e1)).alias("example_id"),
    )
    lo = F.greatest(F.col("example_id") * nl, F.col("gstart"))
    hi = F.least((F.col("example_id") + 1) * nl,
                 F.col("gstart") + F.col("n"))
    piece = F.slice(
        "toks",
        (lo - F.col("gstart") + 1).cast("int"),
        (hi - lo).cast("int"),
    )
    pieces = exploded.select(
        "example_id", "docid", "gstart", piece.alias("piece")
    )
    return (
        pieces.groupBy("example_id")
        .agg(
            F.sum(F.size("piece")).cast("int").alias("n_tokens"),
            F.countDistinct("docid").cast("int").alias("n_docs"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("gstart", "piece"))),
                        lambda x: x["piece"],
                    )
                ),
                " ",
            ).alias("text"),
        )
        .orderBy("example_id")
    )
