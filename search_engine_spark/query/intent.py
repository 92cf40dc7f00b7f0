"""Rule-based query-intent classification + entity-ish key-term
extraction (reference spec: docs/features/query-expansion-nlp.md
§4 "Intent Classification" — enum and regex patterns verbatim, in
the reference's evaluation order)."""

from __future__ import annotations

import re

TUTORIAL = "TUTORIAL"
QUESTION = "QUESTION"
DEFINITION = "DEFINITION"
COMPARISON = "COMPARISON"
TROUBLESHOOTING = "TROUBLESHOOTING"
GENERAL = "GENERAL"

# (intent, pattern) in the reference's if-chain order; first match wins.
_RULES: tuple[tuple[str, re.Pattern], ...] = (
    (TUTORIAL, re.compile(r".*(how to|tutorial|guide|learn).*")),
    (QUESTION, re.compile(r".*(what is|why|how does|can).*")),
    (DEFINITION, re.compile(r".*(define|definition|meaning|what does .* mean).*")),
    (COMPARISON, re.compile(r".*(vs|versus|difference between|compare).*")),
    (TROUBLESHOOTING, re.compile(r".*(error|fix|not working|issue|problem).*")),
)

# The TUTORIAL intent adds a should clause match("content",
# "tutorial guide how-to") per the reference's AdvancedSearchService;
# tokenized through the engine tokenizer that is:
TUTORIAL_BOOST_TERMS = ("tutorial", "guide", "how")


def classify_intent(query: str) -> str:
    # fullmatch mirrors Java String.matches() (whole-string): '.' in
    # neither dialect crosses newlines, so a multiline query that only
    # matches on its first line classifies GENERAL in both engines.
    lower = (query or "").lower()
    for intent, pat in _RULES:
        if pat.fullmatch(lower):
            return intent
    return GENERAL


def intent_extra_weights(query: str) -> dict[str, float]:
    """Extra weighted should-terms implied by the query's intent
    (weight 1.0 = an unboosted ES matchQuery clause)."""
    if classify_intent(query) == TUTORIAL:
        return {t: 1.0 for t in TUTORIAL_BOOST_TERMS}
    return {}
