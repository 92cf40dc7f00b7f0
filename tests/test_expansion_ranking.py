"""Query expansion (weighted synonyms) and ML-blend ranking."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.query.expansion import (
    MISSPELLINGS,
    SYNONYMS,
    expand_query,
    suggest_spelling,
)

from tests.oracle import OracleIndex

N = 600
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_exp"))
    return SearchEngine.build(
        spark, corpus_df(spark, N, partitions=6), d, CFG
    )


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(corpus_pandas(N).to_dict("records"))


def test_expand_query_semantics():
    w = expand_query("java search")
    assert w["java"] == 1.0 and w["search"] == 1.0
    assert w["jvm"] == 0.7 and w["query"] == 0.7 and w["lookup"] == 0.7
    # correction applies before expansion
    w2 = expand_query("pyton")
    assert w2["python"] == 1.0 and w2.get("python3") == 0.7
    # original term never downgraded by being another term's synonym
    w3 = expand_query("java jdk")
    assert w3["jdk"] == 1.0


def test_maps_verbatim_from_reference():
    """Byte-parity with QueryExpansionService.java:17-31,88-92."""
    assert SYNONYMS == {
        "java": ("jdk", "jvm", "javac"),
        "python": ("py", "python3", "cpython"),
        "javascript": ("js", "ecmascript", "node"),
        "search": ("find", "lookup", "query"),
        "database": ("db", "datastore", "repository"),
        "algorithm": ("algo", "procedure", "method"),
        "tutorial": ("guide", "howto", "walkthrough"),
        "api": ("interface", "endpoint", "service"),
        "framework": ("library", "toolkit", "platform"),
        "bug": ("error", "issue", "defect"),
    }
    assert MISSPELLINGS == {
        "algoritm": "algorithm",
        "pyton": "python",
        "javascirpt": "javascript",
        "databse": "database",
    }


def test_weighted_search_matches_oracle(engine, oracle):
    for q in ["java", "search database", "pyton tutorial"]:
        weights = expand_query(q)
        got = [
            (r["docid"], r["score"])
            for r in engine.search(q, 10, expand=True).collect()
        ]
        want = oracle.search_weighted(weights, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_suggest_spelling():
    d = {"search", "database", "merge", "parser"}
    out = suggest_spelling(["serach", "databse", "zzz"], d)
    assert out["serach"] == "search"
    assert out["databse"] == "database"
    assert "zzz" not in out


def test_did_you_mean(engine):
    """X5 end-to-end: map corrections + levenshtein fallback against
    the live index dictionary."""
    # fixed-map correction (reference map: pyton -> python)
    assert engine.did_you_mean("pyton merge") == "python merge"
    # levenshtein fallback: 'mergee' is not an index term; 'merge' is
    got = engine.did_you_mean("mergee index")
    assert got == "merge index"
    # nothing to fix
    assert engine.did_you_mean("merge index") is None
    assert engine.did_you_mean("") is None


def test_pagination_and_count(engine, oracle):
    full = [(r["docid"], r["score"]) for r in engine.search("java search", 20).collect()]
    p0 = [(r["docid"], r["score"]) for r in engine.search_page("java search", 0, 5).collect()]
    p1 = [(r["docid"], r["score"]) for r in engine.search_page("java search", 1, 5).collect()]
    assert p0 == full[:5]
    assert p1 == full[5:10]
    # A7: exact match count == oracle's candidate-set size
    got = engine.count_matches("java search")
    want = len(oracle.search_weighted({"java": 1.0, "search": 1.0}, 10**9))
    assert got == want
    assert engine.count_matches("zzznosuchterm") == 0


def test_count_matches_single_term_fast_path(engine, oracle):
    """A7 fast path: a 1-term count comes from the (term, slab) df
    inventory (driver-side pyarrow sum, no postings decode) and must
    equal both the decode path and the brute oracle."""
    for t in ["java", "merge", "parser"]:
        fast = engine.count_matches(t)
        saved = engine._term_slab_cache
        try:
            engine._term_slab_cache = None  # force the decode path
            slow = engine.count_matches(t)
        finally:
            engine._term_slab_cache = saved
        want = len(oracle.search_weighted({t: 1.0}, 10**9))
        assert fast == slow == want, t
    assert engine.count_matches("zzznosuchterm") == 0


def test_quality_materialized_in_docmap(engine):
    """F13 quality is computed once at build time; the stored column
    must equal the on-the-fly expression search_ranked used to pay
    per query."""
    from search_engine_spark.ops.ranking import quality_col
    from search_engine_spark.tokenizer import tokens_col

    dm = engine.docmap
    assert "quality" in dm.columns
    recomputed = dm.select(
        "docid",
        "quality",
        quality_col(F.col("content"), tokens_col("content")).alias("_q"),
    )
    bad = recomputed.filter(F.col("quality") != F.col("_q")).count()
    assert bad == 0


def test_search_ranked_blend_and_diversify(engine, spark):
    rows = engine.search_ranked("java search algorithm", 10).collect()
    assert 0 < len(rows) <= 10
    from collections import Counter

    per_repo = Counter(r["repo"] for r in rows)
    assert max(per_repo.values()) <= 2  # W5
    for r in rows:
        assert 0.0 <= r["ml_score"] <= 1.0
    scores = [r["ml_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # pagerank participation shifts ranking
    pr = spark.createDataFrame(
        [(rows[-1]["docid"], 1.0)], "node long, pagerank double"
    )
    rows2 = engine.search_ranked("java search algorithm", 10, pagerank=pr).collect()
    boosted = {r["docid"]: r["ml_score"] for r in rows2}
    base = {r["docid"]: r["ml_score"] for r in rows}
    did = rows[-1]["docid"]
    if did in boosted and did in base:
        assert boosted[did] > base[did]


def test_spell_suggest_plan_is_hash_join(spark):
    """Plan audit (VERDICT r4 next-item 8): the contract spell_suggest
    query joins the 4 misspelled words to the vocabulary via an
    explode-candidate-lengths BROADCAST HASH equi-join on length(term)
    — never a nested-loop crossJoin whose length-band predicate can't
    push into the join. Semantics are unchanged (the sf0.01 oracle
    stays green); this pins the shape."""
    import io
    from contextlib import redirect_stdout

    from search_engine_spark.contract_ops import q_spell_suggest

    df = q_spell_suggest(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
