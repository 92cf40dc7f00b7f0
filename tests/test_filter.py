"""ES bool.filter (engine.search(filter=...) / search_local(filter=)):
non-scoring keyword-field constraints pushed down into the index as
`m#field=value` postings.  Brute-force oracle pins (single value, OR
within a field, AND across fields), Spark-vs-serving identity,
score-unchanged invariant, composition with must_not / search_after /
deletes, and the index-side properties (vocab exclusion, slab
pruning, purge survival).
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import build_index, compact_index
from tests.oracle import OracleIndex

N_DOCS = 500
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)
Q = "query parse buffer"


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("filtidx"))
    build_index(spark, corpus_df(spark, N_DOCS, partitions=8), d, CFG)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N_DOCS).to_dict("records"))


def _fields(oracle):
    return (
        {dm["docid"]: dm["lang"] for dm in oracle.docmap},
        {dm["docid"]: dm["repo"] for dm in oracle.docmap},
    )


def _brute(oracle, q, pred, k):
    return [(d, s) for d, s in oracle.search(q, 10_000) if pred(d)][:k]


def test_single_value_vs_brute_and_serving(engine, oracle):
    langs, _ = _fields(oracle)
    want = _brute(oracle, Q, lambda d: langs[d] == "java", 10)
    got = [
        (int(r["docid"]), float(r["score"]))
        for r in engine.search(Q, 10, filter={"lang": "java"}).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    loc = engine.search_local(Q, 10, filter={"lang": "java"})
    assert [d for d, _ in loc] == [d for d, _ in want]
    for (_, a), (_, b) in zip(loc, got):
        assert a == pytest.approx(b, rel=1e-12)


def test_or_values_and_and_fields(engine, oracle):
    langs, repos = _fields(oracle)
    want_or = _brute(oracle, Q, lambda d: langs[d] in ("java", "go"), 10)
    got_or = engine.search_local(Q, 10, filter={"lang": ["java", "go"]})
    assert [d for d, _ in got_or] == [d for d, _ in want_or]
    anchor = want_or[0][0]
    f2 = {"lang": langs[anchor], "repo": repos[anchor]}
    want_and = _brute(
        oracle, Q,
        lambda d: langs[d] == f2["lang"] and repos[d] == f2["repo"], 10,
    )
    got_and = engine.search_local(Q, 10, filter=f2)
    assert [d for d, _ in got_and] == [d for d, _ in want_and]
    sp = [
        (int(r["docid"]), float(r["score"]))
        for r in engine.search(Q, 10, filter=f2).collect()
    ]
    assert [d for d, _ in sp] == [d for d, _ in want_and]


def test_scores_unchanged_by_filter(engine):
    """Filter context never scores: a filtered hit's score equals its
    unfiltered score exactly."""
    unf = dict(engine.search_local(Q, 10_000))
    for d, s in engine.search_local(Q, 10, filter={"lang": "java"}):
        assert s == unf[d]


def test_unknown_value_and_field_absent(engine):
    assert engine.search_local(Q, 10, filter={"lang": "zzz"}) == []
    assert engine.search(Q, 10, filter={"lang": "zzz"}).count() == 0
    # a field never indexed has no m# postings -> empty by design
    assert engine.search_local(Q, 10, filter={"nope": "x"}) == []


def test_filter_composes_with_not_after_delete(engine, oracle):
    langs, _ = _fields(oracle)
    base = [
        (int(r["docid"]), float(r["score"]))
        for r in engine.search(
            Q, 30, exclude="config", filter={"lang": "java"}
        ).collect()
    ]
    want = [
        (d, s)
        for d, s in oracle.search_not(Q, "config", 10_000)
        if langs[d] == "java"
    ][:30]
    assert [d for d, _ in base] == [d for d, _ in want]
    if len(base) >= 8:
        cur = (base[4][1], base[4][0])
        page2 = [
            (int(r["docid"]), float(r["score"]))
            for r in engine.search(
                Q, 10, exclude="config", filter={"lang": "java"}, after=cur
            ).collect()
        ]
        assert page2 == base[5:15]
    victims = [base[0][0]]
    engine.delete(docids=victims)
    try:
        got = engine.search_local(Q, 10, filter={"lang": "java"})
        assert victims[0] not in {d for d, _ in got}
    finally:
        import shutil

        shutil.rmtree(f"{engine.index_dir}/tombstones", ignore_errors=True)
        engine.refresh()


def test_meta_terms_stay_out_of_vocab(engine):
    """m# keyword terms must never leak into fuzzy/prefix/suggest
    vocabularies (they are not user tokens)."""
    from search_engine_spark.config import META_PREFIX

    assert not any(
        t.startswith(META_PREFIX) for t in engine._local_vocab_df()
    )
    vocab_terms = [
        r["term"] for r in engine._content_vocab().select("term").collect()
    ]
    assert not any(t.startswith(META_PREFIX) for t in vocab_terms)


def test_filter_survives_purge_compaction(engine, spark, oracle):
    """Metadata chunks compact like any term: filters still work after
    a purging re-encode, minus the purged doc."""
    langs, _ = _fields(oracle)
    pre = engine.search_local(Q, 10, filter={"lang": "python"})
    assert pre, "python-lang matches expected in this corpus"
    engine.delete(docids=[pre[0][0]])
    compact_index(spark, engine.index_dir)
    engine.refresh()
    post = engine.search_local(Q, 10, filter={"lang": "python"})
    assert pre[0][0] not in {d for d, _ in post}
    # purge recomputes stats (scores shift) but the admissible SET
    # is the old one minus the victim
    langs2 = {dm["docid"]: dm["lang"] for dm in oracle.docmap}
    assert all(langs2[d] == "python" for d, _ in post)
    assert set(d for d, _ in pre[1:]) <= (
        {d for d, _ in engine.search_local(Q, 10_000, filter={"lang": "python"})}
    )
