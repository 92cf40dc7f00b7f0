"""Fuzzy + prefix retrieval (query/fuzzy.py, engine.search_fuzzy /
search_prefix and their serving twins): expansion parity between the
DataFrame and driver-side forms, cap/tie-break determinism, boost
math, engine-vs-serving rank identity, and a brute-force oracle pin.
"""

from __future__ import annotations


import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import build_index
from search_engine_spark.query.fuzzy import (
    _lev,
    fuzzy_expand_local,
    fuzzy_expansions,
    prefix_expand_local,
    prefix_expansions,
)
from tests.oracle import OracleIndex

N_DOCS = 600
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fuzzyidx"))
    docs = corpus_df(spark, N_DOCS, partitions=8)
    build_index(spark, docs, d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


# ---------------------------------------------------------------------------
# levenshtein helper


def _lev_ref(a: str, b: str) -> int:
    """Uncapped classic DP, the textbook reference."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_lev_matches_bruteforce():
    words = ["", "a", "ab", "abc", "acb", "bca", "abcd", "xbcd", "abxd",
             "crawl", "crawl3", "crawler", "query", "qery", "python"]
    for a in words:
        for b in words:
            want = _lev_ref(a, b)
            for cap in (1, 2, 3):
                got = _lev(a, b, cap)
                if want <= cap:
                    assert got == want, (a, b, cap)
                else:
                    assert got == cap + 1, (a, b, cap)


# ---------------------------------------------------------------------------
# expansion twins: DataFrame form == driver-side form

_VOCAB = {
    # a crawl-family: one base term, ten digit variants, one -er form
    "crawl": 500, "crawl0": 90, "crawl1": 80, "crawl2": 80, "crawl3": 70,
    "crawl4": 60, "crawl5": 50, "crawl6": 40, "crawl7": 30, "crawl8": 20,
    "crawl9": 10, "crawler": 400,
    # tie-break group: equal df, order must fall back to term asc
    "tie1": 100, "tie2": 100, "tie3": 100, "tie4": 100,
    "query": 300, "qery": 3, "python": 250, "token": 150,
}


def _vocab_df(spark):
    return spark.createDataFrame(
        [(t, float(d)) for t, d in _VOCAB.items()], "term string, df double"
    )


def _df_rows(df):
    return sorted(
        (int(r["qi"]), r["qt"], r["term"], round(float(r["boost"]), 12))
        for r in df.collect()
    )


def _local_rows(rows):
    return sorted((qi, qt, t, round(b, 12)) for qi, qt, t, b in rows)


@pytest.mark.parametrize("max_exp", [50, 5, 3, 1])
def test_fuzzy_twins_and_cap(spark, max_exp):
    terms = ["crawl", "tie0", "qury"]
    df_form = _df_rows(
        fuzzy_expansions(_vocab_df(spark), terms, 1, max_exp)
    )
    local_form = _local_rows(
        fuzzy_expand_local(_VOCAB, terms, 1, max_exp)
    )
    assert df_form == local_form
    # per-qi cap honored
    for qi in range(len(terms)):
        assert sum(1 for r in df_form if r[0] == qi) <= max_exp


def test_fuzzy_cap_order_df_desc_term_asc():
    # "crawl" at d<=1 hits crawl (d0) + crawl0..crawl9 (d1) = 11 terms
    # ("crawler" is d2); cap 3 keeps the 3 highest-df: crawl(500),
    # crawl0(90), crawl1(80) — crawl2 ties crawl1 at 80 and loses on
    # term asc
    rows = fuzzy_expand_local(_VOCAB, ["crawl"], 1, 3)
    assert [t for _qi, _qt, t, _b in rows] == ["crawl", "crawl0", "crawl1"]
    # tie group: "tie0" hits tie1..tie4 all at df 100; term asc decides
    rows = fuzzy_expand_local(_VOCAB, ["tie0"], 1, 2)
    assert [t for _qi, _qt, t, _b in rows] == ["tie1", "tie2"]


def test_fuzzy_boost_values():
    rows = {t: b for _qi, _qt, t, b in fuzzy_expand_local(_VOCAB, ["crawl"], 1, 50)}
    assert rows["crawl"] == 1.0  # exact hit
    # d=1, min(|crawl|, |crawl3|) = 5 -> 1 - 1/5
    assert rows["crawl3"] == pytest.approx(1.0 - 1.0 / 5, abs=0)
    rows = {t: b for _qi, _qt, t, b in fuzzy_expand_local(_VOCAB, ["qury"], 1, 50)}
    # qury->query d=1, min(4,5)=4
    assert rows["query"] == pytest.approx(1.0 - 1.0 / 4, abs=0)
    # qury->qery d=1 substitution, min(4,4)=4
    assert rows["qery"] == pytest.approx(1.0 - 1.0 / 4, abs=0)


@pytest.mark.parametrize("max_exp", [50, 4, 1])
def test_prefix_twins_and_cap(spark, max_exp):
    df_form = sorted(
        r["term"] for r in
        prefix_expansions(_vocab_df(spark), "crawl", max_exp).collect()
    )
    local_form = sorted(prefix_expand_local(_VOCAB, "crawl", max_exp))
    assert df_form == local_form
    assert len(df_form) <= max_exp


def test_prefix_cap_order():
    # prefix "crawl" matches 12 terms; cap 3 keeps crawl(500),
    # crawler(400), crawl0(90)
    assert prefix_expand_local(_VOCAB, "crawl", 3) == [
        "crawl", "crawler", "crawl0"
    ]


def test_fuzzy_no_hit_and_empty():
    assert fuzzy_expand_local(_VOCAB, ["zzzzzzz"], 1, 50) == []
    assert fuzzy_expand_local(_VOCAB, [], 1, 50) == []
    assert prefix_expand_local(_VOCAB, "zzz", 50) == []


# ---------------------------------------------------------------------------
# engine paths: brute-force oracle pin + Spark-vs-serving identity


def _oracle_fuzzy(oracle: OracleIndex, query: str, k: int,
                  max_edits: int = 1, max_expansions: int = 50):
    """Independent reference: expansions over the oracle's own vocab,
    merged in (qi, term) order, scored by the brute-force index."""
    from search_engine_spark.tokenizer import tokenize_query

    vocab = {t: len(p) for t, p in oracle.postings.items()}
    rows = sorted(
        (qi, term, boost)
        for qi, _qt, term, boost in fuzzy_expand_local(
            vocab, tokenize_query(query), max_edits, max_expansions
        )
    )
    weights: dict[str, float] = {}
    for _qi, term, boost in rows:
        weights[term] = weights.get(term, 0.0) + boost
    return oracle.search_weighted(weights, k)


FUZZY_QUERIES = [
    "qery parse",       # typo -> query (plus qery itself if indexed)
    "pyton handler",    # typo -> python
    "crawl buffer",     # 11-term expansion family
    "util config",      # exact terms, boost-1.0 path
]


@pytest.mark.parametrize("q", FUZZY_QUERIES)
def test_engine_fuzzy_vs_oracle(engine, oracle, q):
    got = [(r["docid"], r["score"]) for r in engine.search_fuzzy(q, 10).collect()]
    want = _oracle_fuzzy(oracle, q, 10)
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), q


@pytest.mark.parametrize("q", FUZZY_QUERIES)
def test_serving_fuzzy_identity(engine, q):
    spark_res = [
        (r["docid"], r["score"]) for r in engine.search_fuzzy(q, 10).collect()
    ]
    local_res = engine.search_local_fuzzy(q, 10)
    assert [d for d, _ in spark_res] == [d for d, _ in local_res]
    for (_, a), (_, b) in zip(spark_res, local_res):
        assert a == pytest.approx(b, rel=1e-12)


@pytest.mark.parametrize("pfx", ["crawl", "get", "q"])
def test_serving_prefix_identity(engine, pfx):
    spark_res = [
        (r["docid"], r["score"]) for r in engine.search_prefix(pfx, 10).collect()
    ]
    local_res = engine.search_local_prefix(pfx, 10)
    assert [d for d, _ in spark_res] == [d for d, _ in local_res]
    for (_, a), (_, b) in zip(spark_res, local_res):
        assert a == pytest.approx(b, rel=1e-12)


def test_engine_prefix_vs_oracle(engine, oracle):
    vocab = {t: len(p) for t, p in oracle.postings.items()}
    for pfx in ("crawl", "pars"):
        exp = prefix_expand_local(vocab, pfx, 50)
        want = oracle.search_weighted({t: 1.0 for t in exp}, 10)
        got = [
            (r["docid"], r["score"])
            for r in engine.search_prefix(pfx, 10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], pfx


def test_engine_fuzzy_cap_changes_results(engine):
    """max_expansions caps the crawl-family: capped and uncapped runs
    must both succeed and (given 11 within-distance terms) differ in
    clause count, visible through the score of a crawl-matching doc."""
    full = {t: w for t, w in engine.fuzzy_weights("crawl", 1, 50).items()}
    capped = engine.fuzzy_weights("crawl", 1, 2)
    assert len(capped) == 2 and len(full) > len(capped)
    assert set(capped) <= set(full)


def test_fuzzy_empty_and_oov(engine):
    assert engine.search_fuzzy("", 10).collect() == []
    assert engine.search_local_fuzzy("", 10) == []
    # a token with no within-distance vocab term scores nothing
    assert engine.search_local_fuzzy("zzzzzzzzz", 10) == []
