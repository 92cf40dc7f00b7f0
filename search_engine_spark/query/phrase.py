"""Phrase (match_phrase) BM25 retrieval — scan and positional forms.

The reference's intended ES surface is match/multi_match
(`docs/features/query-expansion-nlp.md:246-300`); ES pairs those with
`match_phrase`, the canonical exact-adjacency query every fulltext
engine ships (Lucene stores term positions in the .pos stream for
exactly this).  The reference never got there (its adapter is a
findAll stub, SearchRepositoryElasticsearchAdapter.java:30-45), so
this module is an extension, implemented Spark-first in two forms:

- **scan form** (`phrase_matches_scan`): the tokens array already in
  the docmap/contract cache IS a positional structure (position =
  array index), so phrase tf is a pure JVM column expression —
  count of start offsets where all n terms line up.  One map stage,
  no shuffle, whole-stage codegen; the semantics gate.
- **positional form** (`positional_postings` +
  `phrase_matches_positional`): the scale path.  Per-(term, docid)
  sorted position lists (what Lucene's .pos stream holds) are built
  once — pruned to the query terms here; persisted for every term by
  `indexer.positions` in the real engine — then the phrase match is
  an n-way docid equi-join folding `array_intersect` over
  offset-shifted position arrays.  Only docs containing EVERY term
  survive the joins, so position work is proportional to the
  candidate set, not the corpus.

Both forms emit identical (docid, doclen, ptf) rows and share
`phrase_topk` for scoring, so they share one DuckDB oracle.

Scoring is ES `match_phrase` semantics: the phrase acts as a single
pseudo-term — tf = number of phrase occurrences in the doc, df =
number of docs containing the phrase — fed through the engine's BM25
(k1=1.2, b=0.75, log1p idf), same expression shape as contract._bm25
so cross-engine doubles match bit-for-bit after ROUND(_, 4).

Adjacency is post-analyzer adjacency: the tokenizer drops stopwords
without leaving position gaps, so "value of table" and "value table"
are the same phrase — the standard behavior for a gapless analyzer
chain (ES analyzers emit position increments; ours is the
no-increment form, documented here and in the oracle twin).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1


def phrase_tf_col(toks: Column, terms: list[str]) -> Column:
    """JVM column: number of occurrences of ``terms`` as an exact
    adjacent run inside the token array ``toks``.

    For n terms the candidate start offsets are 0..size-n (0-based);
    ``element_at`` is 1-based, hence the +1.  ``F.sequence`` would
    generate a DESCENDING sequence when size < n (Spark fills in
    step=-1), so short docs are guarded to a literal 0.
    """
    n = len(terms)
    if n == 1:
        return F.size(F.filter(toks, lambda x: x == F.lit(terms[0])))

    def is_match(i: Column) -> Column:
        return functools.reduce(
            operator.and_,
            (
                F.element_at(toks, i + j + 1) == F.lit(t)
                for j, t in enumerate(terms)
            ),
        )

    starts = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n, F.size(F.filter(starts, is_match))
    ).otherwise(F.lit(0))


def near_tf_col(toks: Column, terms: list[str], slop: int) -> Column:
    """JVM column: in-order proximity tf (Lucene SpanNearQuery
    inOrder=true analog): number of start positions p0 of ``terms[0]``
    that begin an increasing chain p0 < p1 < ... < p_{n-1} (term j at
    p_j) with total gap p_{n-1} - p0 - (n-1) <= ``slop``.

    The witness chain is the GREEDY one (each p_j = smallest position
    of term j greater than p_{j-1}): greedy minimizes every p_j by
    induction, hence minimizes the span, so a valid chain exists from
    p0 iff the greedy chain is valid — the count is exact, not a
    heuristic.  ``slop=0`` degenerates to exact adjacency
    (= ``phrase_tf_col``; pinned in pytest).  Unordered rearrangement
    (ES match_phrase slop's transposition-costs-2 semantics) is out of
    scope — this is the in-order span form, documented divergence.

    Pure column expression — positions per term are 1-based index
    arrays filtered from the token array; the chain unrolls to nested
    higher-order functions (array_min over filter), so the whole thing
    stays in whole-stage codegen like ``phrase_tf_col``.
    """
    n = len(terms)
    if n == 1:
        return F.size(F.filter(toks, lambda x: x == F.lit(terms[0])))
    idxs = F.sequence(F.lit(1), F.size(toks))

    # NB: every lambda below takes exactly ONE parameter and closes
    # over its context via a factory — F.filter/F.transform introspect
    # the arity, and a second (even defaulted) parameter would receive
    # the array index (the documented trap in grouped_phrase_starts).
    def _pos_of(t: str) -> Column:
        return F.filter(idxs, lambda i: F.element_at(toks, i) == F.lit(t))

    pos_arrays = [_pos_of(t) for t in terms]

    def _next_after(arr: Column, prev: Column) -> Column:
        return F.array_min(F.filter(arr, lambda x: x > prev))

    def chain_valid(p0: Column) -> Column:
        prev = p0
        for j in range(1, n):
            prev = _next_after(pos_arrays[j], prev)
        return prev.isNotNull() & (prev - p0 - (n - 1) <= F.lit(slop))

    return F.when(
        F.size(toks) >= n, F.size(F.filter(pos_arrays[0], chain_valid))
    ).otherwise(F.lit(0))


def near_matches_scan(
    tl: DataFrame, terms: list[str], slop: int
) -> DataFrame:
    """Scan form: (docid, doclen, ptf>0) for the in-order proximity
    match — one codegen'd map stage, same shape as the exact form."""
    return (
        tl.select(
            "docid",
            "doclen",
            near_tf_col(F.col("toks"), terms, slop).alias("ptf"),
        )
        .filter(F.col("ptf") > 0)
    )


def phrase_matches_scan(tl: DataFrame, terms: list[str]) -> DataFrame:
    """Scan form: (docid, doclen, ptf>0) via one codegen'd map stage."""
    return (
        tl.select(
            "docid",
            "doclen",
            phrase_tf_col(F.col("toks"), terms).alias("ptf"),
        )
        .filter(F.col("ptf") > 0)
    )


def positional_postings(tl: DataFrame, terms: list[str]) -> DataFrame:
    """Pruned positional posting lists: (term, docid, doclen,
    positions sorted asc).

    ``collect_list`` order is nondeterministic under parallel merge,
    so the list is ``array_sort``-ed — positions are produced
    pre-sorted per doc by posexplode, but only within a partition.
    """
    return (
        tl.select(
            "docid",
            "doclen",
            F.posexplode("toks").alias("pos", "term"),
        )
        .filter(F.col("term").isin(list(set(terms))))
        .groupBy("term", "docid", "doclen")
        .agg(F.array_sort(F.collect_list("pos")).alias("positions"))
    )


def fold_phrase_starts(
    plists: DataFrame, terms: list[str], carry: list[str] = ()
) -> DataFrame:
    """Fold ``array_intersect`` over offset-shifted position lists.

    A phrase occurrence starting at p needs term j at position p+j, so
    term j's positions shifted by -j intersected across all j yields
    the start positions; ptf = its size.  ``carry`` names extra
    columns of the term-0 rows to keep (the contract form carries
    doclen; the engine's positional segments don't store it and join
    it post-match instead).

    Duplicate terms in the phrase are handled naturally — the same
    (term, docid) positions row joins once per offset it occupies.
    """
    carry = list(carry)
    acc = plists.filter(F.col("term") == terms[0]).select(
        "docid", *carry, F.col("positions").alias("starts")
    )
    for j in range(1, len(terms)):
        nxt = plists.filter(F.col("term") == terms[j]).select(
            "docid",
            F.transform("positions", lambda p: p - F.lit(j)).alias(f"p{j}"),
        )
        acc = acc.join(nxt, "docid").select(
            "docid",
            *carry,
            F.array_intersect("starts", f"p{j}").alias("starts"),
        )
    return acc.select(
        "docid", *carry, F.size("starts").alias("ptf")
    ).filter(F.col("ptf") > 0)


def phrase_matches_positional(
    plists: DataFrame, terms: list[str]
) -> DataFrame:
    """Positional form over (term, docid, doclen, positions) lists:
    (docid, doclen, ptf>0)."""
    return fold_phrase_starts(plists, terms, carry=["doclen"]).select(
        "docid", "doclen", "ptf"
    )


def grouped_phrase_starts(
    plists: DataFrame, terms: list[str]
) -> DataFrame:
    """Single-pass variant of ``fold_phrase_starts``: ONE
    groupBy(docid) shuffle instead of n-1 docid equi-joins.

    The join fold re-executes its input plan once per term (each
    ``plists.filter(term == t)`` branch is a separate scan+decode) —
    fine for the contract twin over a cached token table, wasteful
    for the engine where the input is a pruned parquet scan plus a
    varint-decode ``mapInPandas``.  Here the decoded rows shuffle
    once into (docid -> term->positions map); the intersect fold is
    then pure column expressions over the map.  Duplicate phrase
    terms read the same map entry — the exact semantics the join
    form gets from the same row joining at each offset.  Result is
    identical by construction: same shifted-intersect algebra.
    """
    uniq = list(dict.fromkeys(terms))
    grouped = (
        plists.groupBy("docid")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("m")
        )
        # a doc missing any distinct term cannot match (conjunctive)
        .filter(F.size("m") == len(uniq))
    )
    # NB: the shift lambda must take exactly ONE parameter —
    # F.transform introspects the arity and would feed the array
    # index into a second (even defaulted) parameter.
    def shift(j: int):
        return lambda p: p - F.lit(j)

    starts = F.col("m").getItem(terms[0])
    for j in range(1, len(terms)):
        starts = F.array_intersect(
            starts, F.transform(F.col("m").getItem(terms[j]), shift(j))
        )
    return grouped.select(
        "docid", F.size(starts).alias("ptf")
    ).filter(F.col("ptf") > 0)


def phrase_topk(matches: DataFrame, tl: DataFrame, k: int) -> DataFrame:
    """Score phrase matches as a single BM25 pseudo-term and take
    top-k.  ``matches`` = (docid, doclen, ptf) with ptf > 0; ``tl``
    supplies corpus stats (n_docs, avgdl over ALL docs, matching the
    oracle's stats CTE).  Same expression shape as contract._bm25 so
    the doubles are bit-identical cross-engine."""
    stats = tl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    dfp = matches.agg(F.count("*").cast("double").alias("df"))
    tfd = F.col("ptf").cast("double")
    scored = (
        matches.crossJoin(F.broadcast(dfp))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "raw",
            F.log1p((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (
                tfd
                * (BM25_K1 + 1.0)
                / (
                    tfd
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("doclen") / F.col("avgdl"))
                )
            ),
        )
    )
    return (
        scored.orderBy(F.desc("raw"), F.asc("docid"))
        .limit(k)
        .select("docid", F.round("raw", 4).alias("score"))
    )
