#!/usr/bin/env python
"""Evidence for the round-5 minhash verify hardening: measures the
exact-verify join's per-side payload (string shingle sets vs 60-bit
hash sets) and wall time for the three verify paths at an sf dir.

Appends one JSON line to BENCH/minhash_verify.jsonl.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.contract import documents_tokenized  # noqa: E402
from search_engine_spark.ops import minhash  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="bench-minhash-verify",
        parallelism=cpus,
        shuffle_partitions=cpus * 4,
        driver_memory="8g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = documents_tokenized(spark, sf_dir).select("docid", "toks").cache()
    n_docs = docs.count()

    # Payload per doc, exactly as each variant ships it: the string
    # variant serializes every shingle's UTF-8 bytes; the hash variant
    # ships 8 bytes per distinct shingle.
    pay = docs.select(
        F.aggregate(
            minhash.shingles_col("toks"),
            F.lit(0).cast("long"),
            lambda acc, s: acc + F.octet_length(s),
        ).alias("str_bytes"),
        (F.size(minhash.shingles_col("toks")) * 8).cast("long").alias(
            "hash_bytes"
        ),
    ).agg(
        F.sum("str_bytes").alias("str_bytes"),
        F.sum("hash_bytes").alias("hash_bytes"),
    ).first()

    def timed(fn):
        t0 = time.monotonic()
        rows = fn().collect()
        return round(time.monotonic() - t0, 3), len(rows)

    # string-set variant (the pre-r5 shape), inline twin of the old code
    def string_pairs():
        sig = minhash.minhash_signatures(docs)
        cand = minhash.neardup_candidates(sig)
        sets_ = docs.select(
            "docid", F.sort_array(minhash.shingles_col("toks")).alias("sh")
        )
        return (
            cand.join(sets_.withColumnRenamed("docid", "docid_a").withColumnRenamed("sh", "sh_a"), "docid_a")
            .join(sets_.withColumnRenamed("docid", "docid_b").withColumnRenamed("sh", "sh_b"), "docid_b")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("docid_a", "docid_b", F.round("jaccard", 5).alias("jaccard"))
        )

    t_str, n_str = timed(string_pairs)
    t_hash, n_hash = timed(lambda: minhash.neardup_pairs(docs))
    t_est, n_est = timed(
        lambda: minhash.neardup_pairs(docs, verify="estimate")
    )
    assert n_str == n_hash, (n_str, n_hash)

    row = {
        "metric": "minhash_verify",
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "n_docs": n_docs,
        "payload_bytes_string_sets": int(pay.str_bytes),
        "payload_bytes_hash_sets": int(pay.hash_bytes),
        "payload_ratio": round(pay.str_bytes / max(pay.hash_bytes, 1), 2),
        "wall_sec": {"string": t_str, "hash": t_hash, "estimate": t_est},
        "pairs": {"string": n_str, "hash": n_hash, "estimate": n_est},
        "parallelism": cpus,
    }
    out = os.path.join(REPO, "BENCH", "minhash_verify.jsonl")
    with open(out, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
