"""Application layer: the reference's SearchDocumentsUseCase.

`execute(request) -> response` mirrors the reference use case
(SearchDocumentsUseCase.java:45-91) over the Spark engine: cache
check (verbatim ``search:{q}:{page}:{size}:{sort}`` key, 30-minute
TTL), repository page fetch honoring EVERY SearchRequestDTO param
(query, page/size, sortBy relevance|date|pagerank, language, domain,
dateFrom/dateTo, minContentQuality — SearchRequestDTO.java:16-24),
total count, and the SearchResponseDTO mapping
(SearchResponseDTO.java:17-41: query, totalResults, page, size,
totalPages = ceil(total/size), searchTimeMs, results[url, title,
snippet, relevanceScore, pagerankScore, language, crawledAt,
highlightedTerms], suggestions).

Semantics notes (engine-defined where the reference left gaps):

- ``totalResults`` counts by QUERY only (the reference's
  ``countResults(query)`` takes no filters — mirrored exactly).
- ``url`` is the canonical document key ``repo/path@commit`` (F7 —
  the code-corpus analog of the page URL).
- ``crawledAt`` is the ISO date of the synthetic publish day
  (PUBLISH_EPOCH + pub_day(docid)) — the SAME day sortBy="date" and
  dateFrom/dateTo use, so the response dates are consistent with
  sorting and filtering.
- ``highlightedTerms`` lists the analyzed query terms (the reference
  HighlightBuilder marks every query term).
- ``suggestions`` holds did_you_mean output when the query matched
  nothing (the reference's GetSuggestionsUseCase is a stub returning
  [] — GetSuggestionsUseCase.java:20-28; this exceeds it), else [].
- ``pagerankScore`` joins a supplied (docid, rank) table (e.g.
  ops/graph.pagerank_converged output), 0.0 when absent — the
  reference reads the entity's stored pagerank the same way.
"""

from __future__ import annotations

import datetime
import math
import time

from pyspark.sql import DataFrame, functions as F

from search_engine_spark.cache import SearchCache, search_key
from search_engine_spark.tokenizer import tokenize_query

CACHE_TTL_SEC = 30 * 60.0  # CACHE_TTL_MINUTES = 30 (UseCase.java:26)


class GetSuggestionsUseCase:
    """The controller's second endpoint (SearchControllerV2.java:64-70
    -> GetSuggestionsUseCase.java): prefix autocomplete.  The
    reference's implementation is an acknowledged stub returning []
    (GetSuggestionsUseCase.java:25-27 "TODO ... return empty list");
    this one is real — the DEFAULT_LIMIT=5 highest-df vocabulary
    completions of the prefix via the engine's capped prefix-expansion
    table (query/fuzzy.prefix_expansions: a distributed TakeOrdered,
    never an unpartitioned window).  The reference's sub-2-char guard
    is kept verbatim."""

    DEFAULT_LIMIT = 5  # GetSuggestionsUseCase.java:14

    def __init__(self, engine):
        self.engine = engine

    def execute(self, prefix: str, limit: int | None = None) -> list[str]:
        if not prefix or len(prefix) < 2:
            return []
        from search_engine_spark.query.fuzzy import prefix_expansions

        n = limit if limit is not None else self.DEFAULT_LIMIT
        exp = prefix_expansions(
            self.engine._content_vocab(), prefix.lower(), n
        )
        return [r["term"] for r in exp.select("term").collect()]


class SearchDocumentsUseCase:
    """execute(SearchRequestDTO) -> SearchResponseDTO over a
    SearchEngine (the domain repository analog)."""

    def __init__(self, engine, cache: SearchCache | None = None):
        self.engine = engine
        self.cache = cache if cache is not None else SearchCache()

    def execute(self, request: dict) -> dict:
        t0 = time.time()
        q = request["query"]
        page = int(request.get("page") or 0)
        size = int(request.get("size") or 10)
        sort_by = request.get("sortBy") or "relevance"
        key = search_key(q, page, size, sort_by)
        hit = self.cache.get(key)
        if hit is not None:
            return hit

        filters: dict = {}
        if request.get("language"):
            filters["lang"] = request["language"]
        if request.get("domain"):
            filters["repo"] = request["domain"]
        kw = dict(
            filter=filters or None,
            date_from=request.get("dateFrom"),
            date_to=request.get("dateTo"),
            min_quality=request.get("minContentQuality"),
        )
        n_fetch = (page + 1) * size
        if sort_by in ("relevance", "score"):
            hits = self.engine.search(q, n_fetch, **kw)
            hits = hits.select("docid", "score")
        else:
            hits = self.engine.search_sorted(
                q, n_fetch, sort_by, rank=request.get("rank"), **kw
            ).select("docid", "score")
        rows = hits.collect()[page * size:]

        total = self.engine.count_matches(q)
        results = self._map_results(q, rows, request.get("rank"))
        # did_you_mean returns the corrected query or None (nothing
        # to suggest); the DTO carries a list either way
        dym = self.engine.did_you_mean(q) if total == 0 else None
        suggestions = [dym] if dym else []
        response = {
            "query": q,
            "totalResults": total,
            "page": page,
            "size": size,
            "totalPages": int(math.ceil(total / size)) if size else 0,
            "searchTimeMs": int((time.time() - t0) * 1000),
            "results": results,
            "suggestions": suggestions,
        }
        self.cache.put(key, response, CACHE_TTL_SEC)
        return response

    def execute_local(self, request: dict) -> dict:
        """Serving twin of ``execute`` — NO Spark job anywhere: hits
        via search_local / search_local_sorted, total via
        count_matches_local, suggestions via did_you_mean_local,
        metadata for the page via one row-group-pruned pyarrow docmap
        read, the snippet via the python twin of plain_snippet_col.
        Identical responses to execute() (pinned in pytest) at
        serving-head latency — the shape a REST tier would run.

        Boundary: sortBy date/pagerank combined with field/range
        filters needs the Spark path (search_local_sorted takes no
        filters); ``rank`` here is a {docid: rank} dict, not a
        DataFrame."""
        t0 = time.time()
        q = request["query"]
        page = int(request.get("page") or 0)
        size = int(request.get("size") or 10)
        sort_by = request.get("sortBy") or "relevance"
        key = search_key(q, page, size, sort_by) + ":local"
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        filters: dict = {}
        if request.get("language"):
            filters["lang"] = request["language"]
        if request.get("domain"):
            filters["repo"] = request["domain"]
        kw = dict(
            filter=filters or None,
            date_from=request.get("dateFrom"),
            date_to=request.get("dateTo"),
            min_quality=request.get("minContentQuality"),
        )
        n_fetch = (page + 1) * size
        if sort_by in ("relevance", "score"):
            hits = self.engine.search_local(q, n_fetch, **kw)
        else:
            if filters or any(
                request.get(x) is not None
                for x in ("dateFrom", "dateTo", "minContentQuality")
            ):
                raise NotImplementedError(
                    "sortBy date/pagerank with filters: use execute()"
                )
            hits = [
                (d, s)
                for d, _key, s in self.engine.search_local_sorted(
                    q, n_fetch, sort_by, rank=request.get("rank")
                )
            ]
        rows = hits[page * size:]
        total = self.engine.count_matches_local(q)
        results = self._map_results_local(q, rows, request.get("rank"))
        dym = self.engine.did_you_mean_local(q) if total == 0 else None
        response = {
            "query": q,
            "totalResults": total,
            "page": page,
            "size": size,
            "totalPages": int(math.ceil(total / size)) if size else 0,
            "searchTimeMs": int((time.time() - t0) * 1000),
            "results": results,
            "suggestions": [dym] if dym else [],
        }
        self.cache.put(key, response, CACHE_TTL_SEC)
        return response

    @staticmethod
    def _py_snippet(text: str) -> str:
        """Python twin of query/highlight.plain_snippet_col — same
        rule, same boundaries (pinned via execute_local == execute)."""
        import re

        if len(text) <= 200:
            return text
        sub = text[:200]
        m = re.match(r"^([\s\S]{100,199}) ", sub)
        return (m.group(1) if m else sub) + "..."

    def _map_results_local(self, q: str, rows, rank):
        """No-Spark DTO mapping: one pyarrow docmap read filtered to
        the page's docids (row-group pruned — docmap is docid-ordered)
        instead of a Spark join."""
        import pyarrow.dataset as ds

        from search_engine_spark.ops.ranking import (
            PUBLISH_EPOCH,
            PUBLISH_RANGE_DAYS,
        )

        if not rows:
            return []
        ids = [int(d) for d, _ in rows]
        tab = ds.dataset(
            f"{self.engine.index_dir}/docmap", partitioning="hive"
        ).to_table(
            filter=ds.field("docid").isin(ids),
            columns=["docid", "repo", "path", "commit", "lang", "content"],
        )
        by_id = {
            int(r["docid"]): r for r in tab.to_pylist()
        }
        epoch = datetime.date.fromisoformat(PUBLISH_EPOCH)
        terms = tokenize_query(q)
        rank_map = rank or {}
        out = []
        for d, s in rows:
            m = by_id[int(d)]
            day = (int(d) * 16807) % PUBLISH_RANGE_DAYS
            out.append(
                {
                    "url": f"{m['repo']}/{m['path']}@{m['commit']}",
                    "title": m["path"].rsplit("/", 1)[-1],
                    "snippet": self._py_snippet(m["content"]),
                    "relevanceScore": float(s),
                    "pagerankScore": float(rank_map.get(int(d), 0.0)),
                    "language": m["lang"],
                    "crawledAt": (
                        epoch + datetime.timedelta(days=day)
                    ).isoformat(),
                    "highlightedTerms": list(terms),
                }
            )
        return out

    def _map_results(self, q: str, rows, rank: DataFrame | None):
        """Domain-entity -> DTO mapping (UseCase.java:93-102) for one
        page of (docid, score) hits: broadcast the tiny page against
        the docmap projection — never shuffle the corpus."""
        from search_engine_spark.indexer.docmap import title_col
        from search_engine_spark.ops.ranking import (
            PUBLISH_EPOCH,
            pub_day_col,
        )
        from search_engine_spark.query.highlight import plain_snippet_col

        if not rows:
            return []
        eng = self.engine
        page_df = eng.spark.createDataFrame(
            [(int(r["docid"]), float(r["score"])) for r in rows],
            "docid long, score double",
        )
        snippet = plain_snippet_col("content")
        meta = eng.docmap.join(F.broadcast(page_df), "docid").select(
            "docid",
            "score",
            F.concat_ws(
                "", F.col("repo"), F.lit("/"), F.col("path"),
                F.lit("@"), F.col("commit"),
            ).alias("url"),
            title_col("path").alias("title"),
            snippet.alias("snippet"),
            F.col("lang").alias("language"),
            pub_day_col(F.col("docid")).cast("int").alias("day"),
        )
        if rank is not None:
            r = rank.select(
                F.col(rank.columns[0]).cast("long").alias("docid"),
                F.col(rank.columns[1]).cast("double").alias("prk"),
            )
            meta = meta.join(F.broadcast(r), "docid", "left").fillna(
                {"prk": 0.0}
            )
        else:
            meta = meta.withColumn("prk", F.lit(0.0))
        by_id = {int(m["docid"]): m for m in meta.collect()}
        epoch = datetime.date.fromisoformat(PUBLISH_EPOCH)
        terms = tokenize_query(q)
        out = []
        for r in rows:  # preserve the page's rank order
            m = by_id[int(r["docid"])]
            out.append(
                {
                    "url": m["url"],
                    "title": m["title"],
                    "snippet": m["snippet"],
                    "relevanceScore": float(r["score"]),
                    "pagerankScore": float(m["prk"]),
                    "language": m["language"],
                    "crawledAt": (
                        epoch + datetime.timedelta(days=int(m["day"]))
                    ).isoformat(),
                    "highlightedTerms": list(terms),
                }
            )
        return out
