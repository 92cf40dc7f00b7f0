"""Distributed BPE tokenizer training (ops/bpe.py): parity with the
ACL'16 reference implementation, partitioning invariance (the
determinism-across-cluster-sizes claim), encoder properties, and the
fully-merged-word guard.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.ops.bpe import (
    END_WORD,
    bpe_encode_col,
    bpe_train,
    merges_df,
    py_bpe_reference,
)
from search_engine_spark.tokenizer import py_tokenize

N_DOCS = 150
N_MERGES = 15


@pytest.fixture(scope="module")
def ref_merges():
    wf: Counter = Counter()
    for rec in corpus_pandas(N_DOCS).to_dict("records"):
        for t in py_tokenize(rec["content"]):
            wf[t] += 1
    return py_bpe_reference(dict(wf), N_MERGES)


@pytest.fixture(scope="module")
def spark_merges(spark):
    docs = corpus_df(spark, N_DOCS, partitions=8)
    merges, words = bpe_train(spark, docs, N_MERGES)
    words.unpersist()
    return merges


def test_parity_with_reference(spark_merges, ref_merges):
    assert spark_merges == ref_merges
    assert len(spark_merges) == N_MERGES


def test_partitioning_invariance(spark, spark_merges):
    """The learned merge list is a pure function of the corpus —
    identical at 1 and 8 partitions (integer counts, total-order
    tie-break), which is what makes training reproducible across
    cluster sizes."""
    docs1 = corpus_df(spark, N_DOCS, partitions=1)
    merges1, words = bpe_train(spark, docs1, N_MERGES)
    words.unpersist()
    assert merges1 == spark_merges


def test_counts_monotone_and_positive(spark_merges):
    # pair counts never increase as merges consume occurrences of
    # their parts... not strictly monotone in general, but always > 0
    # and rank-1 is the global max
    assert all(c > 0 for _, _, c in spark_merges)
    assert spark_merges[0][2] == max(c for _, _, c in spark_merges)


def test_encoder_roundtrip(spark, spark_merges):
    """Encoding never loses characters: joining the encoded symbols
    and stripping the end marker reconstructs the word; every symbol
    is a learned merge product or a single character."""
    docs = corpus_df(spark, 40, partitions=4)
    words = (
        docs.select(F.explode(F.split(F.lower(F.col("content")), "[^a-z]+")).alias("w"))
        .filter(F.length("w") > 2)
        .distinct()
        .limit(200)
    )
    enc = words.withColumn("syms", bpe_encode_col(F.col("w"), spark_merges))
    rows = enc.collect()
    assert rows
    vocab = {a + b for a, b, _ in spark_merges}
    for r in rows:
        syms = r["syms"]
        joined = "".join(syms)
        assert joined == r["w"] + END_WORD
        for s in syms:
            core = s[: -len(END_WORD)] if s.endswith(END_WORD) else s
            assert (
                len(core) <= 1
                or core in vocab
                or (core + END_WORD) in vocab
                or s in vocab
            ), s


def test_fully_merged_word_guard(spark):
    """A corpus of one distinct word merges down to a single symbol:
    the pair counter must handle size-1 symbol arrays (Spark's
    sequence(0,-1) descends) and training stops early."""
    docs = spark.createDataFrame(
        [("r", "p", "c", "abc abc abc")], "repo string, path string, commit string, content string"
    )
    merges, words = bpe_train(spark, docs, 10)
    final = [r["sym"] for r in words.collect()]
    words.unpersist()
    # 4 initial symbols (a b c </w>) -> 3 merges -> early stop
    assert len(merges) == 3
    assert final == ["abc" + END_WORD]


def test_merge_semantics_overlapping_pairs(spark):
    """The double-space replace must equal the canonical index walk on
    the overlap shapes where a single-space replace diverges: 'banana'
    under (a,n) and odd runs under (a,a).  Pinned against _walk_merge
    (the independent reference), full corpus included via
    test_parity_with_reference."""
    from search_engine_spark.ops.bpe import SEP, _apply_merge, _walk_merge

    cases = [
        ("b a n a n a </w>".split(), "a", "n"),
        ("a a a a a </w>".split(), "a", "a"),
        ("a a a a </w>".split(), "a", "a"),
        ("x a b a b a b y </w>".split(), "a", "b"),
        ("a a </w>".split(), "a", "a"),
    ]
    df = spark.createDataFrame(
        [(SEP.join(parts),) for parts, _, _ in cases], "sym string"
    )
    rows = df.collect()
    for (parts, a, b), r in zip(cases, rows):
        got = [
            x["m"]
            for x in spark.createDataFrame([(r["sym"],)], "sym string")
            .withColumn("m", _apply_merge(F.col("sym"), a, b))
            .collect()
        ][0]
        assert got == SEP.join(_walk_merge(parts, a, b)), (parts, a, b)


def test_training_on_repeat_words(spark):
    """End-to-end training on a corpus rich in 'banana'-shaped repeat
    words agrees with the index-walk reference — the case the
    single-space representation got wrong."""
    text = "banana bananana abababa aaaa banana abababa aaaa aaaa"
    docs = spark.createDataFrame(
        [("r", "p", "c", text)],
        "repo string, path string, commit string, content string",
    )
    merges, words = bpe_train(spark, docs, 8)
    words.unpersist()
    wf: Counter = Counter()
    for t in py_tokenize(text):
        wf[t] += 1
    assert merges == py_bpe_reference(dict(wf), 8)


def test_encode_join_matches_replay(spark):
    """bpe_encode_join: in-vocabulary words take the trained symbol
    string, OOV words fall back to the replay — both identical to
    bpe_encode_col on every word."""
    from pyspark.sql import functions as F2

    from search_engine_spark.ops.bpe import bpe_encode_join

    docs = corpus_df(spark, 60, partitions=4)
    merges, words = bpe_train(spark, docs, 10)
    vocab_words = [r["word"] for r in words.select("word").limit(5).collect()]
    probe = spark.createDataFrame(
        [(w,) for w in vocab_words] + [("zzqqxonotrained",)],
        "word string",
    )
    via_join = {
        r["word"]: r["syms"]
        for r in bpe_encode_join(probe, words, merges).collect()
    }
    via_replay = {
        r["word"]: r["syms"]
        for r in probe.withColumn(
            "syms", bpe_encode_col(F2.col("word"), merges)
        ).collect()
    }
    words.unpersist()
    assert via_join == via_replay
    assert "zzqqxonotrained" in via_join  # OOV took the fallback


def test_merges_df_shape(spark, spark_merges):
    df = merges_df(spark, spark_merges)
    assert df.columns == ["rank", "left", "right", "cnt"]
    rows = df.collect()
    assert [r["rank"] for r in rows] == list(range(1, N_MERGES + 1))
