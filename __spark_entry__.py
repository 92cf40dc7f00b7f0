"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 query end-to-end on sf0.001.
``queries()``/``oracle_sql()`` pair every implemented operator with a
DuckDB twin; the SQL strings are generated from the same tokenizer
semantics / BM25 constants the engine uses
(``search_engine_spark.oracle.sqlgen``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark import contract as C
from search_engine_spark import contract_ops as CO
from search_engine_spark.oracle import sqlgen as O
from search_engine_spark.oracle import sqlgen_ops as OO

BM25_QUERIES = {
    "bm25_q1": "key order merge scan",
    "bm25_q2": "spark filter",
    "bm25_q3": "table",
    "bm25_q4": "zzznosuchterm data",
}

# Same queries through the REAL index path (sha-dedup -> compressed
# segments -> per-slab block-max WAND); oracle twin adds the dedup CTE.
WAND_QUERIES = {
    "bm25_wand_q1": "key order merge scan",
    "bm25_wand_q2": "group data row column",
    "bm25_wand_q3": "slow",
}

# Query expansion (verbatim reference maps): misspelling corrections
# at weight 1.0 + synonyms at 0.7 (QueryExpansionService.java:17-31,
# 62-80, 88-92).
# Queries chosen so expansion demonstrably fires on the synthetic
# vocabulary: "search" expands to synonym "query" (weight 0.7), which
# IS a corpus term; "serach"/"pyton" exercise the correction maps.
EXPANDED_QUERIES = {
    "bm25_expanded_q1": "search data",
    "bm25_expanded_q2": "serach pyton table",
}

# Conjunctive retrieval (ES bool.must, SURVEY J4) through the real
# index path; oracle twin adds HAVING count(distinct term) = n.
AND_QUERIES = {
    "bm25_and_q1": "group data row",
    "bm25_and_q2": "table scan",
}

# Exclusion retrieval (ES bool.must_not) through the real index path:
# disjunctive WAND over the scored terms minus docs containing any
# excluded term ("table" is a hot corpus term, so the exclusion
# demonstrably reshapes the top-k); oracle twin anti-joins the
# exploded token stream.
NOT_QUERY = ("key order merge scan", "table")

# Field-weighted BM25 (title^3/content^1; with expansion the synonym
# clauses score title^2/content^0.8) — the reference's intended query
# (docs/features/query-expansion-nlp.md:260-275) through the real
# two-field index path.  (name, (query, expand))
FIELDS_QUERIES = {
    "bm25_fields_q1": ("key order merge scan", False),
    "bm25_fields_q2": ("database search", True),
}

HIGHLIGHT_QUERIES = {
    "highlight_q1": "data table merge",
}

# The COMPLETE composed query (AdvancedSearchService): BEST_FIELDS
# originals (title^3/content^1) + per-synonym clauses (2.0/0.8) +
# TUTORIAL-intent clause + entity clauses + function_score MULTIPLY
# log1p(2*pagerank).  q1 fires TUTORIAL intent ("how to") and the
# "search"->"query" synonym (query IS a corpus term); q2 fires the
# "python" entity clause and TUTORIAL via "guide" (both plan-only on
# this 29-word corpus — their terms have df 0 — while join/hash score;
# entity/intent clauses firing with real matches is pinned in pytest
# on the code corpus); q3 is the bare BEST_FIELDS + pagerank path.
FULL_QUERIES = {
    "bm25_full_q1": "how to search data",
    "bm25_full_q2": "python join hash guide",
    "bm25_full_q3": "table scan merge",
}


# Round-4 contract queries for the previously pytest-only operators:
# W2 pagination (page 2 of a multi-term query with >20 matches), S8
# result cache (served THROUGH a SearchCache hit), and the X9/W6/W5
# ML blend + diversification path.
PAGE_QUERY = "key order merge scan"
CACHE_QUERY = "group data row column"
RANKED_QUERY = "key order merge scan"

# Round-5 fuzzy + prefix retrieval (ES `match` fuzziness / `prefix`
# under the scoring_boolean rewrite; semantics frozen in
# query/fuzzy.py).  "spart" expands to BOTH "spark" and "part" at
# distance 1, "kay" to "key", and "data" is an exact vocabulary hit
# (boost 1.0) — so one query exercises d=0 and d=1 boosts and a
# multi-expansion term.  Prefix "s" expands to six corpus terms
# (small scan slow sort spark stream).
FUZZY_QUERY = "spart kay data"
PREFIX_QUERY = "s"

# Round-5 phrase retrieval (ES match_phrase analog — the reference's
# adapter never got past findAll, so this is an extension; see
# query/phrase.py).  Each phrase runs through BOTH forms — scan
# (token-array adjacency, pure codegen) and positional (Lucene-.pos
# shaped position-list intersection) — which are identical by
# construction and share one oracle; the gate window carries the scan
# form on the bigram and the positional form on the trigram so both
# code paths AND both phrase lengths get driver-gated.
PHRASE_QUERIES = {
    "bm25_phrase_q1": "table hash",
    "bm25_phrase_q2": "spark table hash",
}

# In-order proximity (SpanNearQuery inOrder=true analog; slop = max
# total gap in the greedy chain — query/phrase.near_tf_col).  Same
# phrases as the exact entries so the slop semantics demonstrably
# fire: the slop>0 results differ from bm25_phrase_q1/q2's.
NEAR_QUERIES = {
    "bm25_near_q1": ("table hash", 1),
    "bm25_near_q2": ("spark table hash", 2),
}

# Round-5 session-5: SearchRequestDTO numeric range filters
# (dateFrom/dateTo/minContentQuality — SearchRequestDTO.java:22-24).
# The day window covers ~59% of the synthetic calendar and the
# quality floor sits mid-distribution, so BOTH predicates demonstrably
# drop docs from the unfiltered top-k at sf0.01 and sf0.1.
RANGE_PARAMS = {"day_from": 300, "day_to": 1800, "min_quality": 0.45}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents corpus."""
    return C.q_bm25(spark, "/root/testdata/sf0.001", "key order merge scan", 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "term_counts": partial(C.q_term_counts),
        "term_df": partial(C.q_term_df),
        "corpus_stats": partial(C.q_corpus_stats),
        "exact_dedup": partial(C.q_exact_dedup),
        "snippet": partial(C.q_snippet),
        "quality_score": partial(C.q_quality_score),
    }
    for name, text in BM25_QUERIES.items():
        q[name] = partial(C.q_bm25, query=text, k=10)
    for name, text in WAND_QUERIES.items():
        q[name] = partial(C.q_bm25_wand, query=text, k=10)
    for name, text in EXPANDED_QUERIES.items():
        q[name] = partial(C.q_bm25_expanded, query=text, k=10)
    for name, text in AND_QUERIES.items():
        q[name] = partial(C.q_bm25_and, query=text, k=10)
    for name, (text, exp) in FIELDS_QUERIES.items():
        q[name] = partial(C.q_bm25_fields, query=text, k=10, expand=exp)
    for name, text in HIGHLIGHT_QUERIES.items():
        q[name] = partial(C.q_highlight, query=text, limit=100)
    for name, text in FULL_QUERIES.items():
        q[name] = partial(C.q_bm25_full, query=text, k=10)
    # round 4: pagination (W2), result cache (S8), ML blend (X9/W6/W5)
    q["bm25_page2"] = partial(
        C.q_bm25_page, query=PAGE_QUERY, page=1, size=10
    )
    # round 5 session 4: ES search_after keyset pagination — the
    # kernel-level cursor admission path (query/wand._after_mask),
    # distinct from bm25_page2's driver-side rank window.  Same query
    # so both pagination semantics are gated on the same ranking.
    q["bm25_after_q1"] = partial(C.q_bm25_after, query=PAGE_QUERY, k=10)
    # round 5: match_phrase — scan form on the bigram, positional
    # form on the trigram (in-window); the cross twins sit in the
    # sweep-verified tail
    q["bm25_phrase_q1"] = partial(
        C.q_bm25_phrase, phrase=PHRASE_QUERIES["bm25_phrase_q1"], k=10
    )
    q["bm25_phrase_ix_q2"] = partial(
        C.q_bm25_phrase_indexed, phrase=PHRASE_QUERIES["bm25_phrase_q2"], k=10
    )
    # round 5: fuzzy (levenshtein<=1, Lucene boost, df-capped
    # expansion) and prefix (scoring_boolean) retrieval
    q["bm25_fuzzy_q1"] = partial(C.q_bm25_fuzzy, query=FUZZY_QUERY, k=10)
    q["bm25_prefix_q1"] = partial(C.q_bm25_prefix, prefix=PREFIX_QUERY, k=10)
    # round 5 session 5: SearchRequestDTO numeric range filters
    # (dateFrom/dateTo/minContentQuality — the last three DTO params,
    # completing the request surface).  In-window scan form gates the
    # semantics; the kernel form (raw-int64 doc-values admission
    # through make_slab_scorer) sits in the sweep tail.  `snippet`
    # moves to the tail for the slot: highlight_q1 (also in-window,
    # 100 rows) runs the identical snippet projection WITH <mark>
    # highlighting on top — a strict computation superset.
    q["bm25_range_q1"] = partial(
        C.q_bm25_range, query=PAGE_QUERY, **RANGE_PARAMS, k=10
    )
    # round 5 session 5: distributed BPE tokenizer training (the
    # subword-vocabulary learner of LLM pipelines, ops/bpe.py) — the
    # DuckDB twin replays the full training loop as chained
    # MATERIALIZED CTE rounds, so the gate covers pair counting, the
    # tie-break AND the merge application.  `bm25_q1` moves to the
    # tail for the slot: its naive scan scoring core is a strict
    # computation subset of in-window bm25_range_q1 (same
    # _bm25_scores + range admission on top).
    q["bpe_merges"] = partial(C.q_bpe_merges, n_merges=12)
    q["cached_search"] = partial(C.q_cached_search, query=CACHE_QUERY, k=10)
    q["ranked_blend"] = partial(C.q_ranked_blend, query=RANKED_QUERY, k=10)
    q.update(
        {
            "simhash_fp": CO.q_simhash_fp,
            "simhash_neardup": CO.q_simhash_neardup,
            "minhash_sig": CO.q_minhash_sig,
            "minhash_neardup": CO.q_minhash_neardup,
            "lang_id": CO.q_lang_id,
            "token_counts": CO.q_token_counts,
            "fingerprint": CO.q_fingerprint,
            "cosine_topk": CO.q_cosine_topk,
            "ann_sign_lsh": CO.q_ann_sign_lsh,
            "ann_ivf": CO.q_ann_ivf,
            "ann_lsh_indexed": CO.q_ann_lsh_indexed,
            "ann_ivf_indexed": CO.q_ann_ivf_indexed,
            "cosine_neardup": CO.q_cosine_neardup,
            "pagerank": CO.q_pagerank,
            "diversify_by_source": CO.q_diversify_by_source,
            "spell_suggest": CO.q_spell_suggest,
            "url_priority": CO.q_url_priority,
            "url_priority_strategies": CO.q_url_priority_strategies,
            "opic_cash": CO.q_opic_cash,
            "status_rollup": CO.q_status_rollup,
            "top_customers": CO.q_top_customers,
            "freshness_decay": CO.q_freshness_decay,
            "events_windowed": CO.q_events_windowed,
            "sessionize": CO.q_sessionize,
            "sessionize_stream": CO.q_sessionize_stream,
            "training_pipeline": CO.q_training_pipeline,
            "simhash_similarity": CO.q_simhash_similarity,
            "media_features": CO.q_media_features,
            "codec_roundtrip": CO.q_codec_roundtrip,
            "chunk_documents": CO.q_chunk_documents,
            "pack_examples": CO.q_pack_examples,
            # dup_spans + hll_vocab close the driver window (slots
            # 49-50): dup_spans' slot was freed by demoting ann_ivf
            # (whose oracle ann_ivf_indexed shares byte-for-byte),
            # hll_vocab's by demoting bm25_expanded_q2 (a second data
            # point on the SO3 expansion machinery bm25_expanded_q1
            # gates) — this gives the sketch family a driver gate
            "dup_spans": CO.q_dup_spans,
            "hll_vocab": CO.q_hll_vocab,
            # positions 51+ sit outside the driver's 50-row window by
            # design — every remaining gated entry covers a distinct
            # code path; these are verified by the all-scale sweep
            # like the parked tail
            "scrub_pii": CO.q_scrub_pii,
            "decontaminate": CO.q_decontaminate,
            "gopher_quality": CO.q_gopher_quality,
            "sample_stratified": CO.q_sample_stratified,
            "dup_span_ranges": CO.q_dup_span_ranges,
            "lm_score": CO.q_lm_score,
            # deterministic distributed sketches (r5): constant-
            # shuffle cardinality / frequency at 100 TB; hll_vocab
            # itself is gated in-window above
            "hll_vocab_stream": CO.q_hll_vocab_stream,
            "cms_term_freq": CO.q_cms_term_freq,
            "cms_term_freq_stream": CO.q_cms_term_freq_stream,
        }
    )
    # Gate ordering (round 5): the driver records only the FIRST 50
    # entries, so redundant/subsumed twins go last — bm25_q2/q3/q4
    # re-cover the naive path that bm25_q1 + the wand/and/fields/full
    # families already gate, ann_sign_lsh's and ann_ivf's indexed
    # twins (ann_lsh_indexed / ann_ivf_indexed) share their oracles
    # byte-for-byte, bm25_and_q2 re-covers the conjunctive path
    # bm25_and_q1 gates, and simhash_fp's and minhash_sig's machinery
    # is consumed (and therefore gated) by their downstream neardup
    # entries.  This puts sessionize_stream / training_pipeline /
    # simhash_similarity / media_features (never driver-gated in
    # rounds 1-4), codec_roundtrip (the round-5 real-decode gate:
    # five codecs + quarantine through decode_features),
    # chunk_documents / pack_examples / dup_spans (the round-5
    # training-pipeline ops) inside the window; the tail eight plus
    # the four 51+ curation entries stay green in
    # scripts/contract_sweep.py.
    # round-5 phrase additions need two window slots: bm25_wand_q2
    # joins the tail (same 4-term WAND shape bm25_wand_q1 gates; q3's
    # single-term dispatch stays) and bm25_full_q2 joins the tail
    # (its distinguishing entity/intent clauses are plan-only — df 0 —
    # on this corpus, so its gated computation duplicates
    # bm25_full_q3's; the clauses firing for real is pytest-pinned on
    # the code corpus).
    q["bm25_phrase_q2"] = partial(
        C.q_bm25_phrase, phrase=PHRASE_QUERIES["bm25_phrase_q2"], k=10
    )
    q["bm25_phrase_ix_q1"] = partial(
        C.q_bm25_phrase_indexed, phrase=PHRASE_QUERIES["bm25_phrase_q1"], k=10
    )
    # engine-path fuzzy (expansion resolved against the real index's
    # df table, boosts folded into WAND idf) — sweep tail; the scan
    # form bm25_fuzzy_q1 gates the expansion semantics in-window
    q["bm25_fuzzy_wand_q1"] = partial(
        C.q_bm25_fuzzy_wand, query=FUZZY_QUERY, k=10
    )
    # bool.must_not exclusion retrieval (sweep tail — the window is
    # full of distinct code paths; the all-scale sweep hash-gates it)
    q["bm25_not_q1"] = partial(
        C.q_bm25_not, query=NOT_QUERY[0], exclude=NOT_QUERY[1], k=10
    )
    # in-order proximity retrieval (sweep tail, same rationale)
    for name, (ph, slop) in NEAR_QUERIES.items():
        q[name] = partial(C.q_bm25_near, phrase=ph, slop=slop, k=10)
    # sortBy date/pagerank (SearchRequestDTO.java:19 semantics the ES
    # adapter never applied) — sweep tail: match set -> deterministic
    # docid-derived key -> top-k -> score join (contract.q_bm25_sorted)
    q["bm25_sort_date"] = partial(
        C.q_bm25_sorted, query=PAGE_QUERY, sort_by="date", k=20
    )
    q["bm25_sort_rank"] = partial(
        C.q_bm25_sorted, query=PAGE_QUERY, sort_by="pagerank", k=20
    )
    # tombstone-delete masked-ranking invariant (engine.delete /
    # Lucene deleted-docs rule) — sweep tail
    q["bm25_deleted_q1"] = partial(
        C.q_bm25_deleted, query=PAGE_QUERY, k=10
    )
    # ES terms-aggregation facets + more_like_this — sweep tail
    q["bm25_facets_q1"] = partial(
        C.q_bm25_facets, query=PAGE_QUERY, field="source", size=10
    )
    q["more_like_this_q1"] = partial(C.q_more_like_this, docid=42, k=10)
    # ES explain API: per-term score breakdown for one (query, doc)
    q["bm25_explain_q1"] = partial(
        C.q_bm25_explain, query=PAGE_QUERY, docid=42
    )
    # ES bool.filter (non-scoring keyword-field constraint)
    q["bm25_filter_q1"] = partial(
        C.q_bm25_filtered, query=PAGE_QUERY, field="lang", value="zh", k=10
    )
    # range filters through the real kernel admission machinery
    # (sweep tail; the scan form gates the semantics in-window)
    q["bm25_range_wand_q1"] = partial(
        C.q_bm25_range_wand, query=PAGE_QUERY, **RANGE_PARAMS, k=10
    )
    # ES minimum_should_match: 2-of-4 on the 4-term page query — the
    # m-of-n middle ground between the gated OR (bm25_wand_q1) and
    # bool.must (bm25_and_q1) forms, which share the same kernel
    # counting machinery (sweep tail)
    q["bm25_msm_q1"] = partial(C.q_bm25_msm, query=PAGE_QUERY, m=2, k=10)
    # SearchDocumentsUseCase response assembly (usecase.py): page-2
    # rank window + the SearchResultDTO projection (url/snippet/
    # language/crawledAt) in one gated DataFrame (sweep tail)
    q["search_response_q1"] = partial(
        C.q_search_response, query=PAGE_QUERY, page=1, size=10
    )
    # round-5 fuzzy/prefix need two window slots: bm25_full_q3 joins
    # the tail (its bare BEST_FIELDS + pagerank computation is a
    # strict subset of bm25_full_q1's, which stays gated) and
    # bm25_fields_q1 joins the tail (fields_q2 runs the same
    # two-field machinery WITH the expansion clauses on top).
    # bm25_after_q1 (kernel cursor admission — a NEW scorer path) takes
    # freshness_decay's window slot: X8 is a three-line pure column
    # expression (exp(-0.01*days) over a datediff) with no index or
    # kernel machinery behind it; the all-scale sweep keeps it
    # hash-gated at sf0.01/0.1/1.
    for tail in ("bm25_q2", "bm25_q3", "bm25_q4", "ann_sign_lsh",
                 "ann_ivf", "bm25_and_q2", "simhash_fp", "minhash_sig",
                 "bm25_wand_q2", "bm25_full_q2", "bm25_full_q3",
                 "bm25_fields_q1", "bm25_expanded_q2", "freshness_decay",
                 "snippet", "bm25_q1"):
        q[tail] = q.pop(tail)
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        "term_counts": O.term_counts_sql(),
        "term_df": O.term_df_sql(),
        "corpus_stats": O.corpus_stats_sql(),
        "exact_dedup": O.exact_dedup_sql(),
        "snippet": O.snippet_sql(),
        "quality_score": O.quality_score_sql(),
    }
    for name, text in BM25_QUERIES.items():
        o[name] = O.bm25_topk_sql(text, 10)
    for name, text in WAND_QUERIES.items():
        o[name] = O.bm25_dedup_topk_sql(text, 10)
    for name, text in EXPANDED_QUERIES.items():
        o[name] = O.bm25_expanded_sql(text, 10)
    for name, text in AND_QUERIES.items():
        o[name] = O.bm25_and_sql(text, 10)
    for name, (text, exp) in FIELDS_QUERIES.items():
        o[name] = O.bm25_fields_sql(text, 10, expand=exp)
    for name, text in HIGHLIGHT_QUERIES.items():
        o[name] = O.highlight_sql(text, 100)
    for name, text in FULL_QUERIES.items():
        o[name] = O.bm25_full_sql(text, 10)
    o["bm25_page2"] = O.bm25_page_sql(PAGE_QUERY, page=1, size=10)
    o["bm25_after_q1"] = O.bm25_after_sql(PAGE_QUERY, 10)
    o["bm25_sort_date"] = O.bm25_sorted_sql(PAGE_QUERY, "date", 20)
    o["bm25_sort_rank"] = O.bm25_sorted_sql(PAGE_QUERY, "pagerank", 20)
    o["bm25_deleted_q1"] = O.bm25_deleted_sql(PAGE_QUERY, 10)
    o["bm25_facets_q1"] = O.bm25_facets_sql(PAGE_QUERY, "source", 10)
    o["more_like_this_q1"] = O.more_like_this_sql(42, 10)
    o["bm25_explain_q1"] = O.bm25_explain_sql(PAGE_QUERY, 42)
    o["bm25_filter_q1"] = O.bm25_filtered_sql(PAGE_QUERY, "lang", "zh", 10)
    o["bm25_range_q1"] = O.bm25_range_sql(PAGE_QUERY, k=10, **RANGE_PARAMS)
    o["bm25_range_wand_q1"] = O.bm25_range_wand_sql(
        PAGE_QUERY, k=10, **RANGE_PARAMS
    )
    o["bm25_msm_q1"] = O.bm25_msm_sql(PAGE_QUERY, 2, 10)
    o["bpe_merges"] = OO.bpe_merges_sql(12)
    o["search_response_q1"] = O.search_response_sql(PAGE_QUERY, 1, 10)
    # scan and positional phrase forms are identical by construction,
    # so each phrase's two entries share one oracle (the ann_* pattern)
    o["bm25_phrase_q1"] = O.bm25_phrase_sql(PHRASE_QUERIES["bm25_phrase_q1"], 10)
    o["bm25_phrase_ix_q1"] = O.bm25_phrase_sql(PHRASE_QUERIES["bm25_phrase_q1"], 10)
    o["bm25_phrase_q2"] = O.bm25_phrase_sql(PHRASE_QUERIES["bm25_phrase_q2"], 10)
    o["bm25_phrase_ix_q2"] = O.bm25_phrase_sql(PHRASE_QUERIES["bm25_phrase_q2"], 10)
    o["bm25_fuzzy_q1"] = O.bm25_fuzzy_sql(FUZZY_QUERY, 10)
    o["bm25_fuzzy_wand_q1"] = O.bm25_fuzzy_sql(FUZZY_QUERY, 10, dedup=True)
    o["bm25_not_q1"] = O.bm25_not_sql(NOT_QUERY[0], NOT_QUERY[1], 10)
    for name, (ph, slop) in NEAR_QUERIES.items():
        o[name] = O.bm25_near_sql(ph, slop, 10)
    o["bm25_prefix_q1"] = O.bm25_prefix_sql(PREFIX_QUERY, 10)
    # the cache returns the engine result verbatim, so its oracle IS
    # the plain dedup BM25 twin — any cache-layer mutation shows up
    o["cached_search"] = O.bm25_dedup_topk_sql(CACHE_QUERY, 10)
    o["ranked_blend"] = O.ranked_blend_sql(RANKED_QUERY, 10)
    o.update(
        {
            "simhash_fp": OO.simhash_fp_sql(),
            "simhash_neardup": OO.simhash_neardup_sql(),
            "minhash_sig": OO.minhash_sig_sql(),
            "minhash_neardup": OO.minhash_neardup_sql(),
            "lang_id": OO.lang_id_sql(),
            "token_counts": OO.token_counts_sql(),
            "fingerprint": OO.fingerprint_sql(),
            "cosine_topk": OO.cosine_topk_sql(),
            "ann_sign_lsh": OO.ann_sign_lsh_sql(),
            "ann_ivf": OO.ann_ivf_sql(),
            # the indexed serving shapes return identical results by
            # construction, so they share the scan forms' oracles
            "ann_lsh_indexed": OO.ann_sign_lsh_sql(),
            "ann_ivf_indexed": OO.ann_ivf_sql(),
            "cosine_neardup": OO.cosine_neardup_sql(),
            "pagerank": OO.pagerank_sql(),
            "diversify_by_source": OO.diversify_by_source_sql(),
            "spell_suggest": OO.spell_suggest_sql(),
            "url_priority": OO.url_priority_sql(),
            "url_priority_strategies": OO.url_priority_strategies_sql(),
            "opic_cash": OO.opic_cash_sql(),
            "status_rollup": OO.status_rollup_sql(),
            "top_customers": OO.top_customers_sql(),
            "freshness_decay": OO.freshness_decay_sql(),
            "events_windowed": OO.events_windowed_sql(),
            "sessionize": OO.sessionize_sql(),
            "sessionize_stream": OO.sessionize_stream_sql(),
            "training_pipeline": OO.training_pipeline_sql(),
            "simhash_similarity": OO.simhash_similarity_sql(),
            "media_features": OO.media_features_sql(),
            "codec_roundtrip": OO.codec_roundtrip_sql(),
            "chunk_documents": OO.chunk_documents_sql(),
            "pack_examples": OO.pack_examples_sql(),
            "dup_spans": OO.dup_spans_sql(),
            "scrub_pii": OO.scrub_pii_sql(),
            "decontaminate": OO.decontaminate_sql(),
            "gopher_quality": OO.gopher_quality_sql(),
            "sample_stratified": OO.sample_stratified_sql(),
            "dup_span_ranges": OO.dup_span_ranges_sql(),
            "lm_score": OO.lm_score_sql(),
            "hll_vocab": OO.hll_vocab_sql(),
            # streaming registers == batch registers by construction;
            # the stream shares the batch twin's oracle (the
            # sessionize_stream discipline)
            "hll_vocab_stream": OO.hll_vocab_sql(),
            "cms_term_freq": OO.cms_term_freq_sql(),
            "cms_term_freq_stream": OO.cms_term_freq_sql(),
        }
    )
    return o
