"""Sequence packing (ops/packing.py): stream algebra vs a Python
reference, bucket determinism, and edge shapes."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.packing import pack_examples


def _reference(docs, n):
    """Python reference: concatenate tokens in docid order, split
    every n; report (n_tokens, n_docs, text) per example."""
    stream, owners = [], []
    for docid, toks in sorted(docs):
        stream.extend(toks)
        owners.extend([docid] * len(toks))
    out = []
    for e in range(0, len(stream), n):
        toks = stream[e:e + n]
        out.append((e // n, len(toks), len(set(owners[e:e + n])),
                    " ".join(toks)))
    return out


def _spark_pack(spark, docs, n, **kw):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs], "docid long, toks array<string>"
    )
    rows = pack_examples(df, context_len=n, **kw).collect()
    return [(r.example_id, r.n_tokens, r.n_docs, r.text) for r in rows]


def test_packing_matches_reference(spark):
    docs = [
        (0, [f"a{i}" for i in range(37)]),
        (1, []),                                   # dropped
        (2, [f"b{i}" for i in range(301)]),        # spans 3+ examples
        (5, ["lone"]),
        (9, [f"c{i}" for i in range(90)]),
        (12, [f"d{i}" for i in range(128)]),       # exactly one window
    ]
    for n in (128, 64, 7):
        assert _spark_pack(spark, docs, n) == _reference(docs, n), n
    # num_buckets must not change the result (bucket boundaries are
    # a pure docid function; offsets glue them back into one stream)
    for nb in (1, 2, 5, 64):
        assert _spark_pack(spark, docs, 64, num_buckets=nb) == \
            _reference(docs, 64), nb


def test_packing_sparse_docids_and_reconstruction(spark):
    # sparse, irregular docids: bucket assignment is non-contiguous
    docs = [(d, [f"t{d}_{i}" for i in range(1 + d % 17)])
            for d in (3, 1_000, 77, 500_000, 123_456, 4)]
    n = 16
    got = _spark_pack(spark, docs, n)
    assert got == _reference(docs, n)
    # concatenating example texts reconstructs the full stream
    stream = " ".join(t for _, t in sorted(docs) for t in t)
    assert " ".join(text for *_, text in got) == stream
    # all full except possibly the last
    sizes = [s for _, s, _, _ in got]
    assert all(s == n for s in sizes[:-1]) and 0 < sizes[-1] <= n


def test_packing_empty_and_validation(spark):
    empty = spark.createDataFrame([], "docid long, toks array<string>")
    assert pack_examples(empty, context_len=8).count() == 0
    only_empty = spark.createDataFrame(
        [(1, [])], "docid long, toks array<string>")
    assert pack_examples(only_empty, context_len=8).count() == 0
    df = spark.createDataFrame(
        [(1, ["x"])], "docid long, toks array<string>")
    for bad in (0, -3):
        with pytest.raises(ValueError):
            pack_examples(df, context_len=bad)
