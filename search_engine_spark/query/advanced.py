"""The reference's COMPOSED intended query, as a clause plan.

One source of truth for engine (engine.search_advanced), contract
(contract.q_bm25_full) and oracle (sqlgen.bm25_full_sql): the complete
AdvancedSearchService query (docs/features/query-expansion-nlp.md:
246-300) is flattened into rows ``(clause, fld, term, weight)``:

- clause 0: multi_match(corrected original terms, title^3.0,
  content^1.0) with type BEST_FIELDS — ES dis_max over the per-field
  match scores, i.e. score = max(3.0 * BM25_title(all orig terms),
  1.0 * BM25_content(all orig terms)).  (This is the true BEST_FIELDS
  semantic; the simpler ``search_fields`` deliberately keeps the
  BM25F-style cross-field SUM and documents the divergence.)
- one clause per synonym (QueryExpansionService.java synonyms of the
  corrected terms, skipping words already present): default-typed
  multi_match(synonym, title^2.0, content^0.8) — again max over the
  two fields.
- TUTORIAL intent (query/intent.py): one extra content-only clause
  match("content", "tutorial guide how-to") at weight 1.0.
- detected entities (query/entities.py): one extra content-only
  clause per entity word that survives the tokenizer, at weight
  ENTITY_BOOST — mirrors the intent clause's structure (the reference
  documents detection but not its query wiring; this is the engine's
  documented choice).

Scoring downstream: bool score = sum over clauses of
max-over-fields(per-field weighted BM25 sums); final score =
bool score * log1p(PAGERANK_FACTOR * pagerank)  — the function_score
MULTIPLY (natural log1p, the engine's frozen X7 semantic).
"""

from __future__ import annotations

from search_engine_spark.config import (
    CONTENT_BOOST,
    CONTENT_SYNONYM_BOOST,
    TITLE_BOOST,
    TITLE_SYNONYM_BOOST,
)
from search_engine_spark.query.entities import detect_entities
from search_engine_spark.query.expansion import SYNONYMS, correct_terms
from search_engine_spark.query.intent import (
    TUTORIAL,
    TUTORIAL_BOOST_TERMS,
    classify_intent,
)
from search_engine_spark.tokenizer import py_tokenize, tokenize_query

ENTITY_BOOST = 1.0
PAGERANK_FACTOR = 2.0

# fld values used in plan rows
FLD_CONTENT = "c"
FLD_TITLE = "t"


def advanced_plan(query: str) -> list[tuple[int, str, str, float]]:
    """[(clause, fld, term, weight)] for the composed query.

    ``clause`` groups rows whose per-field scores combine by MAX
    (BEST_FIELDS dis_max); distinct clauses combine by SUM (bool
    should).  Content-only clauses (intent/entity) simply have no
    title rows.  Terms are bare tokens — callers namespace title
    terms themselves.
    """
    orig = list(dict.fromkeys(correct_terms(tokenize_query(query))))
    rows: list[tuple[int, str, str, float]] = []
    for t in orig:
        rows.append((0, FLD_CONTENT, t, CONTENT_BOOST))
        rows.append((0, FLD_TITLE, t, TITLE_BOOST))
    clause = 1
    seen = set(orig)
    for t in orig:
        for s in SYNONYMS.get(t, ()):
            # ONE clause per synonym (ES multi_match is per synonym
            # string, not per token): a multi-word synonym's tokens
            # share a clause and combine by max-over-fields within it.
            # All current SYNONYMS values are single tokens, so this
            # matches the historical per-token grouping bit-for-bit.
            added = False
            for st in py_tokenize(s) or [s]:
                if st not in seen:
                    seen.add(st)
                    rows.append((clause, FLD_CONTENT, st, CONTENT_SYNONYM_BOOST))
                    rows.append((clause, FLD_TITLE, st, TITLE_SYNONYM_BOOST))
                    added = True
            if added:
                clause += 1
    if classify_intent(query) == TUTORIAL:
        for t in TUTORIAL_BOOST_TERMS:
            rows.append((clause, FLD_CONTENT, t, 1.0))
        clause += 1
    for word in detect_entities(query):
        # likewise one clause per entity WORD (multi-token words share)
        added = False
        for t in py_tokenize(word):
            rows.append((clause, FLD_CONTENT, t, ENTITY_BOOST))
            added = True
        if added:
            clause += 1
    return rows


def plan_orig_terms(query: str) -> list[str]:
    """The clause-0 (corrected original) terms — the conjunctive
    requirement set for mode='and'."""
    return list(dict.fromkeys(correct_terms(tokenize_query(query))))


def plan_mark_terms(plan: list[tuple[int, str, str, float]]) -> list[str]:
    """Distinct content-side terms for <mark> highlighting (ES
    highlights every matched query/synonym term)."""
    out: list[str] = []
    for _cl, fld, t, _w in plan:
        if fld == FLD_CONTENT and t not in out:
            out.append(t)
    return out
