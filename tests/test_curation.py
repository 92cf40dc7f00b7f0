"""Corpus-curation operators (ops/curation.py): python-reference
parity, edge cases, determinism, and plan shape (broadcast joins
where the 100 TB design claims them; zero per-row Python anywhere)."""

import hashlib

from pyspark.sql import functions as F

from search_engine_spark.ops.curation import (
    decontaminate,
    dup_spans,
    gopher_quality,
    sample_stratified,
)
from search_engine_spark.ops.params import (
    GOPHER_MWL_MAX,
    GOPHER_MWL_MIN,
    GOPHER_TOP_BIGRAM_MAX,
    SAMPLE_BUCKETS,
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(toks, n=3):
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _toks_df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "docid long, toks array<string>"
    )


# --- dup_spans ---------------------------------------------------------------

DOCS = [
    ["a", "b", "c", "d", "a", "b", "c"],      # "a b c" twice IN-doc
    ["x", "y", "z", "q", "r"],                # "x y z" repeated in doc 2
    ["x", "y", "z"],                          # exactly one gram, dup of ^
    ["u", "v"],                               # < n tokens -> no grams
    [],                                       # empty -> no grams
    ["p", "q", "r", "s"],                     # "q r s" unique; "p q r" unique
]


def test_dup_spans_reference_parity(spark):
    from collections import Counter

    cnt = Counter(g for d in DOCS for g in _grams(d))
    want = {}
    for i, d in enumerate(DOCS):
        gs = _grams(d)
        nd = sum(1 for g in gs if cnt[g] >= 2)
        want[i] = (len(gs), nd, nd / len(gs) if gs else 0.0)
    out = {
        r.docid: (r.n_ngrams, r.n_dup, r.dup_frac)
        for r in dup_spans(_toks_df(spark, DOCS), n=3).collect()
    }
    assert out == want
    # the crafted corpus exercises both classes
    assert out[0][1] == 2 and out[3] == (0, 0, 0.0) and out[4] == (0, 0, 0.0)
    assert out[2] == (1, 1, 1.0)   # doc 2's only gram duplicates doc 1's


def test_dup_spans_same_doc_repeats_count(spark):
    # a gram appearing twice in ONE doc (and nowhere else) is duplicated
    out = dup_spans(_toks_df(spark, [["a", "b", "c", "a", "b", "c"]]), n=3)
    r = out.collect()[0]
    # grams: abc bca cab abc -> abc duplicated at 2 of 4 positions
    assert (r.n_ngrams, r.n_dup) == (4, 2)


# --- decontaminate -----------------------------------------------------------

def test_decontaminate_reference_parity(spark):
    corpus = [
        ["a", "b", "c", "d"],          # hits "a b c" and "b c d"
        ["z", "z", "z"],               # no overlap
        ["m", "n"],                    # no grams
        ["b", "c", "d", "e"],          # hits "b c d"
    ]
    ev = [["a", "b", "c", "d"], ["q", "q", "q"]]
    ev_grams = {g for d in ev for g in _grams(d)}
    want = {
        i: sum(1 for g in _grams(d) if g in ev_grams)
        for i, d in enumerate(corpus)
    }
    ev_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ev)],
        "docid long, toks array<string>",
    )
    out = {
        r.docid: (r.n_hits, r.contaminated)
        for r in decontaminate(_toks_df(spark, corpus), ev_df, n=3).collect()
    }
    assert out == {i: (c, c > 0) for i, c in want.items()}
    assert len(out) == len(corpus)    # every corpus doc gets a verdict


def test_decontaminate_broadcasts_eval_side(spark):
    ev = _toks_df(spark, [["a", "b", "c"]])
    plan = decontaminate(
        _toks_df(spark, [["a", "b", "c", "d"]]), ev
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# --- gopher_quality ----------------------------------------------------------

def test_gopher_quality_reference_parity(spark):
    texts = [
        "the cat sat on the mat",                       # normal
        "go go go go go go",                            # one bigram dominates
        "word",                                         # 1 word: no bigrams
        "",                                             # empty
        "  spaced   out   words  ",                     # ragged whitespace
        "supercalifragilistic expialidocious xx",       # long words
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "docid long, text string"
    )
    out = {r.docid: r for r in gopher_quality(df).collect()}
    for i, t in enumerate(texts):
        words = t.split()
        r = out[i]
        assert r.n_words == len(words), i
        mwl = sum(map(len, words)) / len(words) if words else 0.0
        assert r.mean_word_len == mwl, i
        if len(words) > 1:
            from collections import Counter

            bc = Counter(
                f"{words[j]} {words[j + 1]}" for j in range(len(words) - 1)
            )
            tbf = max(bc.values()) / (len(words) - 1)
        else:
            tbf = 0.0
        assert r.top_bigram_frac == tbf, i
        assert r.keep == (
            GOPHER_MWL_MIN <= mwl <= GOPHER_MWL_MAX
            and tbf <= GOPHER_TOP_BIGRAM_MAX
        ), i
    # the fixtures exercise both verdicts
    keeps = {r.keep for r in out.values()}
    assert keeps == {True, False}


# --- sample_stratified -------------------------------------------------------

def test_sample_stratified_reference_and_determinism(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "docid long, lang string")
    rates = {"en": 100, "de": 500, "zh": 1000}
    out = {
        r.docid: (r.lang, r.bucket)
        for r in sample_stratified(df, rates).collect()
    }
    for docid, lang in rows:
        b = _md5_60(str(docid)) % SAMPLE_BUCKETS
        if b < rates[lang]:
            assert out[docid] == (lang, b), docid
        else:
            assert docid not in out, docid
    # zh (rate 1000) keeps everything; en is heavily downsampled
    kept_by = {}
    for _, (lang, _b) in out.items():
        kept_by[lang] = kept_by.get(lang, 0) + 1
    assert kept_by["zh"] == 100
    assert kept_by["en"] < 50

    # partitioning-invariance: the kept set is a pure function of docid
    out2 = {
        r.docid: (r.lang, r.bucket)
        for r in sample_stratified(df.repartition(17), rates).collect()
    }
    assert out2 == out


def test_sample_stratified_unknown_group_uses_default(spark):
    df = spark.createDataFrame(
        [(i, "xx") for i in range(200)], "docid long, lang string"
    )
    out = sample_stratified(df, {"en": 0}, default_rate=1000).count()
    assert out == 200      # unknown group falls back to default (keep all)
    out0 = sample_stratified(df, {"en": 0}, default_rate=0).count()
    assert out0 == 0


# --- plan hygiene ------------------------------------------------------------

def test_curation_plans_have_no_python_eval(spark):
    toks = _toks_df(spark, DOCS)
    docs = spark.createDataFrame(
        [(0, "a b c", "en")], "docid long, text string, lang string"
    )
    frames = [
        dup_spans(toks),
        decontaminate(toks, toks.limit(1)),
        gopher_quality(docs),
        sample_stratified(docs, {"en": 500}),
    ]
    for f in frames:
        plan = f._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


# --- dup_span_ranges ----------------------------------------------------------

def test_dup_span_ranges_reference_parity(spark):
    from collections import Counter

    from search_engine_spark.ops.curation import dup_span_ranges

    docs = [
        # doc 0: "a b c" dup'd at pos 0 and 4 within the doc (non-adjacent
        # islands), "b c d" unique at pos 1
        ["a", "b", "c", "d", "a", "b", "c"],
        # doc 1: all three grams duplicated (doc 2 repeats them) ->
        # ONE maximal island covering the whole doc
        ["p", "q", "r", "s", "t"],
        ["p", "q", "r", "s", "t"],
        ["u", "v"],                    # no grams
    ]
    cnt = Counter(g for d in docs for g in _grams(d))
    want = []
    for i, d in enumerate(docs):
        dpos = [j for j, g in enumerate(_grams(d)) if cnt[g] >= 2]
        run = []
        for p in dpos:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    want.append((i, run[0], run[-1] - run[0] + 3, len(run)))
                run = [p]
        if run:
            want.append((i, run[0], run[-1] - run[0] + 3, len(run)))
    out = [
        (r.docid, r.span_start, r.span_tokens, r.n_positions)
        for r in dup_span_ranges(_toks_df(spark, docs), n=3)
        .orderBy("docid", "span_start")
        .collect()
    ]
    assert out == sorted(want)
    # docs 1/2 merged into one whole-doc island: 3 positions, 5 tokens
    assert (1, 0, 5, 3) in out and (2, 0, 5, 3) in out
    # doc 0 has two singleton islands at 0 and 4, nothing at 1
    assert (0, 0, 3, 1) in out and (0, 4, 3, 1) in out
    assert not any(d == 0 and s == 1 for d, s, _, _ in out)


# --- lm_score ------------------------------------------------------------------

def test_lm_score_reference_parity(spark):
    import math
    from collections import Counter

    from search_engine_spark.ops.curation import lm_score

    docs = [
        ["a", "a", "a", "b"],     # common tokens -> low xent
        ["z"],                    # rare token -> high xent
        [],                       # empty -> (0, 0.0, 1.0)
        ["a", "z", "b", "a"],
    ]
    cnt = Counter(t for d in docs for t in d)
    total = sum(cnt.values())
    out = {
        r.docid: (r.n_toks, r.xent, r.ppl)
        for r in lm_score(_toks_df(spark, docs)).collect()
    }
    for i, d in enumerate(docs):
        if not d:
            assert out[i] == (0, 0.0, 1.0), i
            continue
        xent = -sum(math.log(cnt[t] / total) for t in d) / len(d)
        assert out[i][0] == len(d)
        assert abs(out[i][1] - xent) < 1e-6, i
        assert abs(out[i][2] - math.exp(xent)) < 1e-3, i
    # ordering property: the rare-token doc scores strictly worse
    assert out[1][1] > out[0][1]
