"""MinHash near-dup verification paths (ops/minhash.py).

Pins the round-5 scale hardening of the exact-verify join:

- hash-set verify (shingle_hash_sets: int64 60-bit md5-prefix hashes)
  produces the SAME pairs and jaccard values as the original
  string-set verify, recomputed inline here;
- the signature-level "estimate" fallback (VERDICT r4 scale note:
  never ships shingle sets, for pathological band explosions) finds
  exact duplicates at jaccard 1.0 and near-dups within the estimator's
  sampling error, and rejects unknown modes.
"""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops import minhash
from search_engine_spark.ops.params import MINHASH_K


def _toks(text):
    return text.split()


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "def merge segment buffer flush codec varint block skip list "
        "posting delta encode decode score rank term doc index shard"
    )
    near = base.replace("flush", "sync")  # one token differs
    far = (
        "import numpy pandas arrow parquet schema column batch reader "
        "writer stream channel socket buffer pool alloc free map fold"
    )
    rows = [
        (0, _toks(base)),
        (1, _toks(base)),          # exact dup of 0
        (2, _toks(near)),          # near-dup of 0
        (3, _toks(far)),           # unrelated
    ]
    return spark.createDataFrame(rows, "docid long, toks array<string>")


def _string_set_pairs(docs_toks, threshold):
    """The pre-round-5 verify: exact Jaccard over shingle STRINGS."""
    sig = minhash.minhash_signatures(docs_toks)
    cand = minhash.neardup_candidates(sig)
    sets_ = docs_toks.select(
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
        .filter(F.col("jaccard") >= threshold)
        .select("docid_a", "docid_b", F.round("jaccard", 5).alias("jaccard"))
    )


def test_hash_set_verify_matches_string_set(docs):
    got = sorted(
        minhash.neardup_pairs(docs, threshold=0.2).collect()
    )
    want = sorted(_string_set_pairs(docs, threshold=0.2).collect())
    assert got == want
    assert len(got) >= 2  # (0,1) exact and at least one near pair


def test_exact_dup_jaccard_one(docs):
    rows = {
        (r.docid_a, r.docid_b): r.jaccard
        for r in minhash.neardup_pairs(docs).collect()
    }
    assert rows[(0, 1)] == 1.0


def test_estimate_fallback(docs):
    est = {
        (r.docid_a, r.docid_b): r.jaccard
        for r in minhash.neardup_pairs(
            docs, threshold=0.2, verify="estimate"
        ).collect()
    }
    # exact duplicates: every signature component agrees
    assert est[(0, 1)] == 1.0
    # near-dup of 0: estimate is k-of-16, within sampling error of the
    # exact jaccard (3 std of sqrt(J(1-J)/K))
    exact = {
        (r.docid_a, r.docid_b): r.jaccard
        for r in minhash.neardup_pairs(docs, threshold=0.2).collect()
    }
    for pair, j_est in est.items():
        assert pair in exact
        j = exact[pair]
        tol = 3 * (j * (1 - j) / MINHASH_K) ** 0.5 + 1.0 / MINHASH_K
        assert abs(j_est - j) <= tol, (pair, j_est, j)
    # unrelated doc 3 never pairs
    assert not any(3 in p for p in est)


def test_estimate_granularity(docs):
    # estimate values are multiples of 1/MINHASH_K
    for r in minhash.neardup_pairs(docs, threshold=0.1, verify="estimate").collect():
        assert abs(r.jaccard * MINHASH_K - round(r.jaccard * MINHASH_K)) < 1e-6


def test_bad_mode_rejected(docs):
    with pytest.raises(ValueError):
        minhash.neardup_pairs(docs, verify="fuzzy").collect()
