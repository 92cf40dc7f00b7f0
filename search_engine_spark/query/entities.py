"""Entity detection (reference spec: docs/features/query-expansion-nlp.md
§3 "Entity Detection" — EntityDetector, map entries verbatim).

The reference detects entities by lowercased whitespace split against a
fixed map: programming languages (java/python/javascript), frameworks
(spring/react), and years 2000-2025.  Detection is driver-side (query
strings are tiny); the detected entity terms feed an extra content
should-clause in the composed query (query/advanced.py), mirroring the
TUTORIAL intent clause's structure.

Note on YEAR entities: the engine tokenizer deliberately drops pure
digits (frozen round-1 semantics), so a YEAR entity is *detected* — the
classification is faithful — but contributes no scoring clause (years
cannot appear in the index).  This is documented engine behavior, not
an accident.
"""

from __future__ import annotations

PROGRAMMING_LANGUAGE = "PROGRAMMING_LANGUAGE"
FRAMEWORK = "FRAMEWORK"
YEAR = "YEAR"

# Verbatim from the reference EntityDetector.loadEntities()
# (docs/features/query-expansion-nlp.md:156-175): three languages, two
# frameworks, years 2000..2025 inclusive.
ENTITIES: dict[str, str] = {
    "java": PROGRAMMING_LANGUAGE,
    "python": PROGRAMMING_LANGUAGE,
    "javascript": PROGRAMMING_LANGUAGE,
    "spring": FRAMEWORK,
    "react": FRAMEWORK,
    **{str(y): YEAR for y in range(2000, 2026)},
}


def detect_entities(query: str) -> dict[str, str]:
    """{word: entity_type} — the reference's detectEntities: lowercase,
    split on whitespace, exact map lookup (punctuation-attached words
    do not match, as in the reference)."""
    detected: dict[str, str] = {}
    for word in (query or "").lower().split():
        if word in ENTITIES:
            detected[word] = ENTITIES[word]
    return detected
