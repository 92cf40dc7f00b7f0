"""Token-window chunking (ops/chunking.py): window algebra, edge
cases, and plan shape (the 100 TB claim is 'no shuffle', so the plan
must show none)."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.ops.chunking import chunk_documents, chunk_tokens
from search_engine_spark.tokenizer import py_tokenize as tokenize


def _chunks_of(spark, texts, max_tokens, overlap):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "docid long, content string"
    )
    out = chunk_documents(
        df, max_tokens=max_tokens, overlap=overlap
    ).orderBy("docid", "chunk_id").collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.docid, []).append(r)
    return by_doc


def test_window_algebra_against_reference(spark):
    """Every chunk <= max_tokens; consecutive chunks share exactly
    `overlap` tokens (except a shorter final chunk); concatenating
    chunk 0 plus each later chunk's non-overlap suffix reconstructs
    the document's token list exactly."""
    texts = [
        "alpha beta gamma " * 23,            # 69 tokens
        "one small doc here",                # < one window
        "stopword the a an of",              # mostly stopwords
        "",                                  # empty -> no chunks
        "xy " * 50,                          # all tokens len<=2: filtered
        "solo_token_" + "word " * 31,        # exactly one window
    ]
    max_tokens, overlap = 16, 4
    stride = max_tokens - overlap
    by_doc = _chunks_of(spark, texts, max_tokens, overlap)
    for i, text in enumerate(texts):
        ref = tokenize(text)
        rows = by_doc.get(i, [])
        if not ref:
            assert rows == [], i
            continue
        # starts 0, stride, ... < n  ->  ceil(n / stride) windows
        assert len(rows) == -(-len(ref) // stride), i
        rebuilt = []
        for j, r in enumerate(rows):
            toks = r.chunk.split(" ") if r.chunk else []
            assert r.chunk_id == j
            assert r.n_tokens == len(toks) <= max_tokens
            assert toks == ref[j * stride: j * stride + max_tokens], (i, j)
            if j == 0:
                rebuilt = toks
            else:
                prev = rows[j - 1]
                if prev.n_tokens == max_tokens:  # full predecessor
                    assert toks[:overlap] == \
                        rebuilt[j * stride: j * stride + overlap], (i, j)
                rebuilt += toks[overlap if len(rebuilt) - j * stride
                                >= overlap else 0:]
        assert rebuilt == ref, i


def test_zero_overlap_and_validation(spark):
    df = spark.createDataFrame(
        [(0, "aaa bbb ccc ddd eee fff ggg hhh")], "docid long, content string"
    )
    rows = chunk_documents(df, max_tokens=3, overlap=0) \
        .orderBy("chunk_id").collect()
    assert [r.chunk for r in rows] == [
        "aaa bbb ccc", "ddd eee fff", "ggg hhh"]
    for kw in ({"max_tokens": 0}, {"max_tokens": 8, "overlap": -1},
               {"max_tokens": 8, "overlap": 8},
               {"max_tokens": 8, "overlap": 9}):
        with pytest.raises(ValueError):
            chunk_documents(df, **kw)


def test_chunk_tokens_plan_has_no_shuffle(spark):
    """The operator's 100 TB story is 'row-local fan-out, no
    shuffle': its physical plan must contain no Exchange."""
    df = spark.createDataFrame(
        [(i, "word " * 40) for i in range(8)], "docid long, content string"
    )
    toks = df.select("docid", F.split("content", " ").alias("toks"))
    plan = chunk_tokens(toks)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
