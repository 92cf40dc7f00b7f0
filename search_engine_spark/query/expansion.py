"""Query expansion — reference semantics (SO3/X5/SO4).

From SE/domain/search/service/QueryExpansionService.java:
- synonym map (:17-30): each original term contributes weight 1.0,
  each synonym weight 0.7 (:62-80),
- misspelling suggestions (:85-103): a fixed correction map plus
  levenshtein-<=2 dictionary lookup (docs/advanced-deep-dive.md:583-638),
- stop-word strip (:108-117) — already inside the engine tokenizer.

Weighted scoring: score(q,d) = sum_t  w_t * idf(t) * tfn(t,d) —
exactly the ES bool.should with per-clause boosts the reference's
intended query builds (docs/features/query-expansion-nlp.md:252-276).
The WAND executor consumes w_t * idf(t) as the per-term weight, so
pruning bounds stay exact.
"""

from __future__ import annotations

from search_engine_spark.tokenizer import py_tokenize, tokenize_query

# Verbatim from QueryExpansionService.java:17-30.
SYNONYMS: dict[str, tuple[str, ...]] = {
    "java": ("jvm", "jdk", "spring"),
    "python": ("py", "django", "flask"),
    "javascript": ("js", "node", "react"),
    "search": ("find", "query", "lookup"),
    "database": ("db", "sql", "storage"),
    "algorithm": ("algo", "method", "technique"),
    "tutorial": ("guide", "howto", "lesson"),
    "api": ("interface", "endpoint", "service"),
    "framework": ("library", "toolkit", "platform"),
    "bug": ("error", "issue", "defect"),
}

# Mirrors the reference's misspelling map (QueryExpansionService.java:85-103).
MISSPELLINGS: dict[str, str] = {
    "javascirpt": "javascript",
    "pyton": "python",
    "pythn": "python",
    "jaava": "java",
    "databse": "database",
    "serach": "search",
    "algorithim": "algorithm",
    "framwork": "framework",
}

ORIGINAL_WEIGHT = 1.0
SYNONYM_WEIGHT = 0.7


def correct_terms(terms: list[str]) -> list[str]:
    """Apply the fixed misspelling map (X5's cheap path)."""
    return [MISSPELLINGS.get(t, t) for t in terms]


def expand_query(query: str) -> dict[str, float]:
    """query string -> {term: weight} with corrections + synonyms.

    Distinct-term semantics: repeated terms keep weight 1.0 (not
    summed); a synonym that is also an original term keeps 1.0.
    """
    terms = correct_terms(tokenize_query(query))
    weights: dict[str, float] = {}
    for t in terms:
        weights[t] = ORIGINAL_WEIGHT
    for t in terms:
        for s in SYNONYMS.get(t, ()):
            for st in py_tokenize(s) or [s]:
                if st not in weights:
                    weights[st] = SYNONYM_WEIGHT
    return weights


def suggest_spelling(
    terms: list[str], dictionary: set[str], max_dist: int = 2
) -> dict[str, str]:
    """Levenshtein-based suggestions against an index dictionary
    (doc-specified behavior; the engine's distributed form is
    contract_ops.q_spell_suggest).  Pure-Python driver helper for
    query-time use with a sampled dictionary."""
    import difflib

    out: dict[str, str] = {}
    for t in terms:
        if t in dictionary:
            continue
        best, bd = None, max_dist + 1
        for cand in dictionary:
            if abs(len(cand) - len(t)) > max_dist:
                continue
            d = _levenshtein_capped(t, cand, max_dist)
            if d < bd or (d == bd and best is not None and cand < best):
                best, bd = cand, d
        if best is not None and bd <= max_dist:
            out[t] = best
    return out


def _levenshtein_capped(a: str, b: str, cap: int) -> int:
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        lo = cap + 1
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            lo = min(lo, v)
        if lo > cap:
            return cap + 1
        prev = cur
    return prev[-1]
