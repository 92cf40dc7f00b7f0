"""Fuzzy (edit-distance) and prefix term retrieval.

ES-staple query forms the reference's users run against its
Elasticsearch backend (the reference delegates matching to ES, whose
`match` accepts `fuzziness` and whose `prefix`/`match_phrase_prefix`
queries expand over the term dictionary; SearchController.java routes
the query string verbatim into that surface).  Semantics frozen here
and mirrored verbatim in the DuckDB oracles
(oracle/sqlgen.bm25_fuzzy_sql / bm25_prefix_sql):

- **expansion set**: vocabulary terms within classic Levenshtein
  distance <= ``max_edits`` of the query term (both Spark's
  ``F.levenshtein`` and DuckDB's ``levenshtein()`` implement the
  classic non-transposition metric, so the two engines agree by
  construction — a documented divergence from ES's default Damerau
  transpositions), or sharing the literal prefix;
- **cap**: at most ``max_expansions`` per query term, highest df
  first (Lucene's TopTermsRewrite keeps the highest-frequency
  terms), term asc on ties — deterministic across engines and
  cluster sizes;
- **scoring rewrite**: ``scoring_boolean`` — every surviving
  expansion is an independent BM25 clause with its own idf.  Fuzzy
  clauses carry the classic Lucene FuzzyTermsEnum boost
  ``1 - d / min(|q|, |t|)`` (1.0 for an exact vocabulary hit);
  prefix clauses weight 1.0;
- a vocabulary term reachable from two different query terms
  contributes one clause per (query term, expansion) pair — the ES
  ``bool.should`` sum.

Scale shape: the vocabulary is grouped once (a shuffle every
scan-form query already pays for df), the query side is a handful of
rows exploded into a length band and BROADCAST into a hash join on
``length(term)`` — the same equi-join discipline as
contract_ops.q_spell_suggest, so Catalyst cannot degrade it to a
nested loop at a 100x vocabulary.  The expansion table itself is
tiny (<= n_terms * max_expansions rows) and broadcasts into the
postings join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_MAX_EDITS = 1
DEFAULT_MAX_EXPANSIONS = 50


def fuzzy_expansions(
    vocab: DataFrame,
    terms: list[str],
    max_edits: int = DEFAULT_MAX_EDITS,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(qi, qt, term, boost, df) — capped fuzzy expansion table.

    ``vocab`` must be (term: string, df: double).  The result is
    small by construction and safe to ``F.broadcast`` into the
    postings join.
    """
    spark = vocab.sparkSession
    qts = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "qi int, qt string"
    )
    cand = qts.withColumn(
        "_cl",
        F.explode(
            F.sequence(
                F.length("qt") - F.lit(max_edits),
                F.length("qt") + F.lit(max_edits),
            )
        ),
    )
    j = (
        vocab.withColumn("_tl", F.length("term"))
        .join(F.broadcast(cand), F.col("_tl") == F.col("_cl"))
        .withColumn("_d", F.levenshtein("qt", "term"))
        .filter(F.col("_d") <= max_edits)
    )
    w = Window.partitionBy("qi").orderBy(F.desc("df"), F.asc("term"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_expansions)
        .withColumn(
            "boost",
            F.lit(1.0)
            - F.col("_d").cast("double")
            / F.least(F.length("qt"), F.length("term")).cast("double"),
        )
        .select("qi", "qt", "term", "boost", "df")
    )


def prefix_expansions(
    vocab: DataFrame,
    prefix: str,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """(term, boost, df) — capped prefix expansion table.

    orderBy + limit (a distributed TakeOrdered), NOT a global
    row_number window — an unpartitioned window would funnel every
    prefix-matching vocabulary term through one task."""
    return (
        vocab.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .withColumn("boost", F.lit(1.0))
        .select("term", "boost", "df")
    )


# ---------------------------------------------------------------------------
# Driver-side twins for the no-Spark serving head.  Same cap, same
# ordering, same boost — pinned against the DataFrame forms in
# tests/test_fuzzy.py so the serving path cannot drift.


def _lev(a: str, b: str, cap: int) -> int:
    """Classic Levenshtein with an early-out cap (banded DP)."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
            best = min(best, cur[j])
        if best > cap:
            return cap + 1
        prev = cur
    return min(prev[-1], cap + 1)


def fuzzy_expand_local(
    vocab: dict[str, int],
    terms: list[str],
    max_edits: int = DEFAULT_MAX_EDITS,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> list[tuple[int, str, str, float]]:
    """[(qi, qt, term, boost)] — driver-side twin of fuzzy_expansions."""
    out: list[tuple[int, str, str, float]] = []
    for qi, qt in enumerate(terms):
        hits = []
        for term, df in vocab.items():
            d = _lev(qt, term, max_edits)
            if d <= max_edits:
                hits.append((-df, term, d))
        hits.sort()
        for _negdf, term, d in hits[:max_expansions]:
            boost = 1.0 - d / min(len(qt), len(term))
            out.append((qi, qt, term, boost))
    return out


def prefix_expand_local(
    vocab: dict[str, int],
    prefix: str,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> list[str]:
    """[term] — driver-side twin of prefix_expansions."""
    hits = sorted(
        ((-df, t) for t, df in vocab.items() if t.startswith(prefix))
    )
    return [t for _negdf, t in hits[:max_expansions]]
