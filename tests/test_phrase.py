"""Phrase (match_phrase) retrieval: scan/positional parity, a pure-
Python tf oracle, edge shapes, and the DuckDB twin on a synthetic
corpus (query/phrase.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.query import phrase as PH
from search_engine_spark.tokenizer import py_tokenize

DOCS = [
    # (docid, text) — tokens after py_tokenize are the lowercase words
    (0, "hash table hash table hash"),          # "hash table" x2, "table hash" x2
    (1, "table hash join"),                     # "table hash" x1
    (2, "hash join table"),                     # adjacency broken
    (3, "aaa aaa aaa aaa"),                     # overlapping runs
    (4, "table"),                               # shorter than the phrase
    (5, "join merge scan table hash table hash"),
    (6, ""),                                    # empty doc
]


def py_phrase_tf(tokens: list[str], terms: list[str]) -> int:
    n = len(terms)
    return sum(
        1
        for i in range(len(tokens) - n + 1)
        if tokens[i : i + n] == terms
    )


@pytest.fixture(scope="module")
def tl(spark):
    rows = [(d, t, py_tokenize(t)) for d, t in DOCS]
    df = spark.createDataFrame(
        rows, "docid long, text string, toks array<string>"
    ).withColumn("doclen", F.size("toks"))
    df = df.cache()
    df.count()
    return df


PHRASES = [
    ["table", "hash"],
    ["hash", "table", "hash"],   # duplicate term at two offsets
    ["aaa", "aaa"],              # overlapping occurrences count each start
    ["table"],                   # single term
    ["join", "zzz"],             # no match anywhere
]


@pytest.mark.parametrize("terms", PHRASES, ids=["-".join(p) for p in PHRASES])
def test_scan_matches_python_reference(tl, terms):
    got = {
        r["docid"]: r["ptf"]
        for r in PH.phrase_matches_scan(tl, terms).collect()
    }
    want = {
        d: py_phrase_tf(py_tokenize(t), terms)
        for d, t in DOCS
        if py_phrase_tf(py_tokenize(t), terms) > 0
    }
    assert got == want


@pytest.mark.parametrize("terms", PHRASES, ids=["-".join(p) for p in PHRASES])
def test_positional_matches_scan(tl, terms):
    scan = sorted(
        map(tuple, PH.phrase_matches_scan(tl, terms)
            .select("docid", "doclen", "ptf").collect())
    )
    pos = sorted(
        map(tuple, PH.phrase_matches_positional(
            PH.positional_postings(tl, terms), terms)
            .select("docid", "doclen", "ptf").collect())
    )
    assert pos == scan


def test_overlapping_counts_each_start(tl):
    # "aaa aaa aaa aaa" has 3 starts for the bigram, 2 for the trigram
    got = {
        r["docid"]: r["ptf"]
        for r in PH.phrase_matches_scan(tl, ["aaa", "aaa"]).collect()
    }
    assert got == {3: 3}
    got3 = {
        r["docid"]: r["ptf"]
        for r in PH.phrase_matches_scan(tl, ["aaa", "aaa", "aaa"]).collect()
    }
    assert got3 == {3: 2}


def test_short_doc_guard(tl):
    # docs shorter than the phrase (incl. the empty doc) never match
    # and never error on the sequence() bounds
    got = PH.phrase_matches_scan(
        tl, ["table", "hash", "join", "merge", "scan", "key", "row"]
    ).collect()
    assert got == []


def test_topk_score_value(tl):
    """Hand-computed BM25 pseudo-term score for 'table hash'."""
    res = PH.phrase_topk(
        PH.phrase_matches_scan(tl, ["table", "hash"]), tl, 10
    ).collect()
    # matches: doc0 ptf=2, doc1 ptf=1, doc5 ptf=2
    n_docs, dfp = 7.0, 3.0
    avgdl = sum(len(py_tokenize(t)) for _, t in DOCS) / n_docs
    idf = math.log1p((n_docs - dfp + 0.5) / (dfp + 0.5))

    def s(ptf, dl):
        return round(
            idf * (ptf * (BM25_K1 + 1.0)
                   / (ptf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))),
            4,
        )

    want = sorted(
        [
            (0, s(2, 5)),
            (1, s(1, 3)),
            (5, s(2, 7)),
        ],
        key=lambda r: (-r[1], r[0]),
    )
    assert [(r["docid"], r["score"]) for r in res] == want


def test_duckdb_twin_on_synthetic(spark, tl, tmp_path):
    """The generated oracle SQL and both Spark forms agree on a table
    DuckDB reads itself (same compare the driver does)."""
    duckdb = pytest.importorskip("duckdb")
    from search_engine_spark.oracle.sqlgen import bm25_phrase_sql

    pdf = tl.select(
        F.col("docid").alias("doc_id"), "text"
    ).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    for phrase in ("table hash", "hash table hash", "join zzz", "table"):
        want = con.sql(bm25_phrase_sql(phrase, 10)).df()
        terms = py_tokenize(phrase)
        got = (
            PH.phrase_topk(PH.phrase_matches_scan(tl, terms), tl, 10)
            .toPandas()
        )
        got_ix = (
            PH.phrase_topk(
                PH.phrase_matches_positional(
                    PH.positional_postings(tl, terms), terms
                ),
                tl,
                10,
            ).toPandas()
        )
        for g in (got, got_ix):
            assert list(g.columns) == list(want.columns)
            assert g["docid"].tolist() == want["docid"].tolist(), phrase
            assert g["score"].tolist() == want["score"].tolist(), phrase


# -- engine positional segments (indexer/positions.py) -----------------


def test_positions_codec_roundtrip():
    """encode/decode_term_positions over fuzzed (docids, plens,
    positions) shapes, incl. single-doc, long runs, and large gaps."""
    import numpy as np

    from search_engine_spark.indexer import positions as POS

    rng = np.random.default_rng(7)
    for trial in range(200):
        n_docs = int(rng.integers(1, 40))
        docids = np.sort(
            rng.choice(100_000, size=n_docs, replace=False)
        ).astype(np.int64)
        plens = rng.integers(1, 12, size=n_docs).astype(np.int64)
        pos = np.concatenate(
            [
                np.sort(rng.choice(5_000, size=int(c), replace=False))
                for c in plens
            ]
        ).astype(np.int64)
        blob = POS.encode_term_positions(docids, plens, pos)
        d2, l2, p2 = POS.decode_term_positions(blob)
        assert (d2 == docids).all() and (l2 == plens).all()
        assert (p2 == pos).all()


@pytest.fixture(scope="module")
def phrase_engine(spark, tmp_path_factory):
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.indexer.build import build_index

    d = str(tmp_path_factory.mktemp("idx_pos"))
    docs = corpus_df(spark, 400, partitions=8)
    build_index(
        spark, docs, d, EngineConfig(slab_size=128, term_buckets=8)
    )
    eng = SearchEngine(spark, d)
    eng.build_positions()
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def phrase_engine_tl(spark, phrase_engine):
    from search_engine_spark.tokenizer import tokens_col

    tl = (
        phrase_engine.docmap.select(
            "docid", tokens_col("content").alias("toks")
        )
        .withColumn("doclen", F.size("toks"))
        .cache()
    )
    tl.count()
    return tl


ENGINE_PHRASES = [
    "merge sort",            # common bigram
    "binary search",         # bigram
    "hash hash",             # duplicate term
    "sort merge sort",       # trigram w/ duplicate
    "zzzzz qqqqq",           # no such terms -> empty via slab prune
    "merge",                 # single-term phrase == plain tf
]


@pytest.mark.parametrize("phrase", ENGINE_PHRASES)
def test_engine_phrase_matches_scan_form(
    phrase_engine, phrase_engine_tl, phrase
):
    """search_phrase (persisted positional segments, pruned scan,
    varint decode, positional fold) is rank- and score-identical to
    the scan form over the same corpus (which test_duckdb_twin pins
    to the DuckDB oracle).  phrase_topk rounds to 4 for the oracle
    compare; the engine returns raw scores like search() — compare at
    the rounded precision and re-check raw order."""
    terms = py_tokenize(phrase)
    want = [
        (r["docid"], r["score"])
        for r in PH.phrase_topk(
            PH.phrase_matches_scan(phrase_engine_tl, terms),
            phrase_engine_tl,
            10,
        ).collect()
    ]
    got_rows = phrase_engine.search_phrase(phrase, 10).collect()
    got = [(r["docid"], round(r["score"], 4)) for r in got_rows]
    assert got == want, phrase
    raw = [r["score"] for r in got_rows]
    assert raw == sorted(raw, reverse=True)


def test_engine_phrase_staleness(spark, tmp_path_factory):
    """No positional index -> refusal; append invalidates; rebuild
    restores and sees the appended docs."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.indexer.build import (
        append_documents,
        build_index,
    )

    d = str(tmp_path_factory.mktemp("idx_pos_stale"))
    docs = corpus_df(spark, 200, partitions=4)
    build_index(
        spark, docs, d, EngineConfig(slab_size=64, term_buckets=8)
    )
    eng = SearchEngine(spark, d)
    with pytest.raises(RuntimeError, match="positional index"):
        eng.search_phrase("merge sort", 5).collect()
    eng.build_positions()
    eng = SearchEngine(spark, d)
    base = eng.search_phrase("merge sort", 5).collect()
    assert len(base) > 0

    extra = spark.createDataFrame(
        [
            ("r/new", f"src/new_{i}.py", "c0", "python",
             "merge sort merge sort merge sort")
            for i in range(3)
        ],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    append_documents(spark, d, extra)
    eng = SearchEngine(spark, d)
    with pytest.raises(RuntimeError, match="stale"):
        eng.search_phrase("merge sort", 5).collect()
    eng.build_positions()
    eng = SearchEngine(spark, d)
    res = eng.search_phrase("merge sort", 5).collect()
    # the appended docs are tiny and pure phrase, so they win top-3
    new_ids = {r["docid"] for r in res[:3]}
    assert len(new_ids) == 3
    assert all(r["score"] >= res[3]["score"] for r in res[:3])


@pytest.mark.parametrize("phrase", ["merge sort", "sort merge sort"])
def test_decode_form_pins_slab_kernel(
    phrase_engine, phrase_engine_tl, phrase
):
    """The readable composition (decode_pos_rows_df ->
    grouped_phrase_starts, pure DataFrame ops) produces the same
    (docid, ptf) set as the scan form — pinning the all-numpy slab
    kernel the engine actually runs (which the engine-vs-scan test
    covers) from a second, independently-built direction."""
    from search_engine_spark.indexer.positions import decode_pos_rows_df
    from search_engine_spark.query.phrase import grouped_phrase_starts

    eng = phrase_engine
    terms = py_tokenize(phrase)
    plists = decode_pos_rows_df(
        eng.store.read(eng.spark, "possegments").filter(
            F.col("term").isin(list(set(terms)))
        ),
        int(eng.meta["slab_size"]),
    )
    got = {
        (r["docid"], r["ptf"])
        for r in grouped_phrase_starts(plists, terms).collect()
    }
    want = {
        (r["docid"], r["ptf"])
        for r in PH.phrase_matches_scan(phrase_engine_tl, terms)
        .select("docid", "ptf")
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("phrase", ENGINE_PHRASES)
def test_phrase_serving_matches_spark(phrase_engine, phrase):
    """search_phrase_local (pyarrow + numpy, no Spark job) is rank-
    and score-identical to search_phrase — the phrase analog of the
    search_local == search pin."""
    want = [
        (r["docid"], r["score"])
        for r in phrase_engine.search_phrase(phrase, 10).collect()
    ]
    got = phrase_engine.search_phrase_local(phrase, 10)
    assert [d for d, _ in got] == [d for d, _ in want], phrase
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=0, abs=0), phrase


def test_incremental_positions_equal_full(spark, tmp_path_factory):
    """After an append, the default incremental positional build
    rewrites only slabs from the old-boundary slab onward — and its
    table is BYTE-IDENTICAL to a from-scratch rebuild."""
    from search_engine_spark.config import EngineConfig
    from search_engine_spark.corpus import corpus_df
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.indexer.build import (
        append_documents,
        build_index,
    )
    from search_engine_spark.indexer.positions import (
        build_positional_index,
    )

    d = str(tmp_path_factory.mktemp("idx_pos_incr"))
    build_index(
        spark,
        corpus_df(spark, 300, partitions=4),
        d,
        EngineConfig(slab_size=64, term_buckets=8),
    )
    eng = SearchEngine(spark, d)
    m0 = eng.build_positions()
    assert m0["mode"] == "full"
    n0 = int(eng.meta["n_docs"])
    # noop when already covered
    assert build_positional_index(spark, d)["mode"] == "noop"

    append_documents(
        spark, d, corpus_df(spark, 360, partitions=4)
    )
    eng = SearchEngine(spark, d)
    m1 = eng.build_positions()
    assert m1["mode"] == "incremental"
    assert m1["from_docid"] == (n0 // 64) * 64

    def snap():
        return (
            eng.store.read(spark, "possegments")
            .orderBy("slab", "bucket", "term")
            .select("slab", "bucket", "term", "df", "posdata")
            .toPandas()
        )

    incr = snap()
    m2 = build_positional_index(spark, d, incremental=False)
    assert m2["mode"] == "full"
    full = snap()
    assert len(incr) == len(full)
    for col in ("slab", "bucket", "term", "df"):
        assert incr[col].tolist() == full[col].tolist()
    assert [bytes(x) for x in incr["posdata"]] == [
        bytes(x) for x in full["posdata"]
    ]


# -- in-order proximity (slop) -----------------------------------------


def py_near_tf(tokens: list[str], terms: list[str], slop: int) -> int:
    """Reference: count of starts p0 with an increasing greedy chain
    (term j at the smallest position > p_{j-1}) of total gap <= slop."""
    n = len(terms)
    if n == 1:
        return tokens.count(terms[0])
    pos = [[i for i, t in enumerate(tokens) if t == term] for term in terms]
    cnt = 0
    for p0 in pos[0]:
        prev, ok = p0, True
        for j in range(1, n):
            nxt = [x for x in pos[j] if x > prev]
            if not nxt:
                ok = False
                break
            prev = min(nxt)
        if ok and prev - p0 - (n - 1) <= slop:
            cnt += 1
    return cnt


NEAR_CASES = [
    (["table", "hash"], 0),
    (["table", "hash"], 1),
    (["hash", "table"], 2),
    (["hash", "table", "hash"], 1),
    (["aaa", "aaa"], 3),          # duplicate term, strict increase
    (["join", "hash"], 10),       # wide window
    (["table"], 2),               # single term: plain tf
]


@pytest.mark.parametrize(
    "terms,slop", NEAR_CASES,
    ids=["-".join(t) + f"~{s}" for t, s in NEAR_CASES],
)
def test_near_scan_matches_python_reference(tl, terms, slop):
    got = {
        r["docid"]: r["ptf"]
        for r in PH.near_matches_scan(tl, terms, slop).collect()
    }
    want = {
        d: py_near_tf(py_tokenize(t), terms, slop)
        for d, t in DOCS
        if py_near_tf(py_tokenize(t), terms, slop) > 0
    }
    assert got == want


@pytest.mark.parametrize("terms", PHRASES, ids=["-".join(p) for p in PHRASES])
def test_near_slop0_equals_exact(tl, terms):
    """slop=0 degenerates to exact adjacency — bit-for-bit."""
    exact = sorted(
        map(tuple, PH.phrase_matches_scan(tl, terms)
            .select("docid", "ptf").collect())
    )
    near = sorted(
        map(tuple, PH.near_matches_scan(tl, terms, 0)
            .select("docid", "ptf").collect())
    )
    assert near == exact


def test_near_duckdb_twin_on_synthetic(spark, tl):
    duckdb = pytest.importorskip("duckdb")
    from search_engine_spark.oracle.sqlgen import bm25_near_sql

    pdf = tl.select(F.col("docid").alias("doc_id"), "text").toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    for phrase, slop in (
        ("table hash", 1), ("hash table hash", 2), ("join zzz", 5),
        ("table", 1),
    ):
        want = con.sql(bm25_near_sql(phrase, slop, 10)).df()
        terms = py_tokenize(phrase)
        got = PH.phrase_topk(
            PH.near_matches_scan(tl, terms, slop), tl, 10
        ).toPandas()
        assert got["docid"].tolist() == want["docid"].tolist(), (phrase, slop)
        assert got["score"].tolist() == want["score"].tolist(), (phrase, slop)


NEAR_ENGINE_CASES = [("merge sort", 1), ("binary search", 2),
                     ("sort merge sort", 1), ("hash hash", 3),
                     ("merge", 2)]


@pytest.mark.parametrize("phrase,slop", NEAR_ENGINE_CASES)
def test_engine_near_matches_scan_form(
    phrase_engine, phrase_engine_tl, phrase, slop
):
    """search_phrase(slop=) through the persisted positional segments
    (greedy composite-key kernel) equals the scan form."""
    terms = py_tokenize(phrase)
    want = [
        (r["docid"], r["score"])
        for r in PH.phrase_topk(
            PH.near_matches_scan(phrase_engine_tl, terms, slop),
            phrase_engine_tl,
            10,
        ).collect()
    ]
    got_rows = phrase_engine.search_phrase(phrase, 10, slop=slop).collect()
    got = [(r["docid"], round(r["score"], 4)) for r in got_rows]
    assert got == want, (phrase, slop)


@pytest.mark.parametrize("phrase,slop", NEAR_ENGINE_CASES)
def test_near_serving_matches_spark(phrase_engine, phrase, slop):
    want = [
        (r["docid"], r["score"])
        for r in phrase_engine.search_phrase(phrase, 10, slop=slop).collect()
    ]
    got = phrase_engine.search_phrase_local(phrase, 10, slop=slop)
    assert [d for d, _ in got] == [d for d, _ in want], (phrase, slop)
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=0, abs=0), (phrase, slop)


def test_near_slop_widens_matches(phrase_engine):
    """Monotonicity: larger slop can only add matching docs."""
    m0 = {d for d, _ in phrase_engine.search_phrase_local("merge sort", 1000)}
    m2 = {d for d, _ in phrase_engine.search_phrase_local(
        "merge sort", 1000, slop=2)}
    assert m0 <= m2
    assert len(m2) > len(m0)  # the relaxation demonstrably fires
