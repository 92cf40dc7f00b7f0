"""Pure-Python brute-force oracle (FIXTURES.md §5).

Independent of Spark: dict-of-dicts inverted index + float64 BM25,
terms summed in sorted-term order, tie-break (score desc, docid asc).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.tokenizer import py_tokenize, tokenize_query


class OracleIndex:
    def __init__(self, docs: list[dict]):
        """docs: [{'repo','path','commit','lang','content'}, ...]."""
        # exact dedup: keep lexicographically-smallest key per sha
        by_sha: dict[str, dict] = {}
        for d in docs:
            sha = hashlib.sha256(d["content"].encode("utf-8")).hexdigest()
            key = (d["repo"], d["path"], d["commit"])
            cur = by_sha.get(sha)
            if cur is None or key < (cur["repo"], cur["path"], cur["commit"]):
                by_sha[sha] = {**d, "content_sha256": sha}
        survivors = sorted(
            by_sha.values(), key=lambda d: (d["repo"], d["path"], d["commit"])
        )
        self.docmap: list[dict] = []
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.doclen: dict[int, int] = {}
        self.quality: dict[int, float] = {}
        for docid, d in enumerate(survivors):
            toks = py_tokenize(d["content"])
            self.doclen[docid] = len(toks)
            tf: dict[str, int] = defaultdict(int)
            for t in toks:
                tf[t] += 1
            for t, c in tf.items():
                self.postings[t][docid] = c
            self.docmap.append({**d, "docid": docid, "doclen": len(toks)})
            from search_engine_spark.ops.ranking import quality_py

            self.quality[docid] = quality_py(d["content"], toks)
        self.n_docs = len(survivors)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )
        # title field: path basename tokens (F2 analog)
        self.title_postings: dict[str, dict[int, int]] = defaultdict(dict)
        self.title_len: dict[int, int] = {}
        for docid, d in enumerate(survivors):
            ttoks = py_tokenize(d["path"].rsplit("/", 1)[-1])
            self.title_len[docid] = len(ttoks)
            tf2: dict[str, int] = defaultdict(int)
            for t in ttoks:
                tf2[t] += 1
            for t, c in tf2.items():
                self.title_postings[t][docid] = c
        self.avgdl_title = (
            sum(self.title_len.values()) / self.n_docs if self.n_docs else 0.0
        )

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def idf_title(self, term: str) -> float:
        df = len(self.title_postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = tokenize_query(query)
        return self.search_weighted({t: 1.0 for t in terms}, k)

    def search_weighted(
        self, weights: dict[str, float], k: int = 10
    ) -> list[tuple[int, float]]:
        scores: dict[int, float] = defaultdict(float)
        for t in sorted(weights):  # sorted-term sum order (bit-stable)
            plist = self.postings.get(t)
            if not plist:
                continue
            w = weights[t] * self.idf(t)
            for docid, tf in plist.items():
                dl = self.doclen[docid]
                tfn = (
                    tf * (BM25_K1 + 1.0)
                    / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                )
                scores[docid] += w * tfn
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_and(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Conjunctive (bool.must): docs containing EVERY query term."""
        terms = tokenize_query(query)
        if not terms:
            return []
        ranked = self.search_weighted({t: 1.0 for t in terms}, 10**9)
        keep = [
            (d, s)
            for d, s in ranked
            if all(d in self.postings.get(t, {}) for t in terms)
        ]
        return keep[:k]

    def search_msm(
        self, query: str, m: int, k: int = 10
    ) -> list[tuple[int, float]]:
        """minimum_should_match: docs matching >= m distinct terms."""
        terms = tokenize_query(query)
        if not terms:
            return []
        ranked = self.search_weighted({t: 1.0 for t in terms}, 10**9)
        keep = [
            (d, s)
            for d, s in ranked
            if sum(1 for t in set(terms) if d in self.postings.get(t, {}))
            >= m
        ]
        return keep[:k]

    def search_not(
        self, query: str, exclude: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """Exclusion (bool.must_not): disjunctive scoring minus docs
        containing ANY excluded term."""
        terms = tokenize_query(query)
        nterms = tokenize_query(exclude)
        if not terms:
            return []
        ranked = self.search_weighted({t: 1.0 for t in terms}, 10**9)
        keep = [
            (d, s)
            for d, s in ranked
            if not any(d in self.postings.get(t, {}) for t in nterms)
        ]
        return keep[:k]

    def search_range(
        self,
        query: str,
        day_from=None,
        day_to=None,
        min_quality=None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """Doc-values range filters (SearchRequestDTO dateFrom/dateTo/
        minContentQuality): disjunctive scoring restricted to the
        synthetic publish-day window + quality floor."""
        terms = tokenize_query(query)
        if not terms:
            return []
        ranked = self.search_weighted({t: 1.0 for t in terms}, 10**9)

        def adm(d: int) -> bool:
            day = (d * 16807) % 2557
            if day_from is not None and day < day_from:
                return False
            if day_to is not None and day > day_to:
                return False
            if min_quality is not None and not (
                self.quality[d] >= min_quality
            ):
                return False
            return True

        return [(d, s) for d, s in ranked if adm(d)][:k]

    def search_fields(
        self, fw: list[tuple], k: int = 10
    ) -> list[tuple[int, float]]:
        """Field-weighted BM25: fw = [(term, w_content, w_title)];
        per-field df/avgdl, contributions summed across fields."""
        scores: dict[int, float] = defaultdict(float)
        for t, wc, wt in sorted(fw):
            for plist, dlmap, avgdl, idf, w in (
                (self.postings.get(t), self.doclen, self.avgdl,
                 self.idf(t), wc),
                (self.title_postings.get(t), self.title_len,
                 self.avgdl_title, self.idf_title(t), wt),
            ):
                if not plist or not w:
                    continue
                wi = w * idf
                for docid, tf in plist.items():
                    dl = dlmap[docid]
                    tfn = (
                        tf * (BM25_K1 + 1.0)
                        / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
                    )
                    scores[docid] += wi * tfn
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


    def search_advanced(
        self,
        plan: list[tuple],
        k: int = 10,
        pagerank: dict[int, float] | None = None,
        missing: float = 0.0,
        factor: float = 2.0,
        required: list[str] | None = None,
    ) -> list[tuple[int, float]]:
        """Composed-query oracle: plan = [(clause, fld, term, w)]
        (query/advanced.py).  Per (doc, clause, field) weighted BM25
        sums, MAX over fields within a clause, SUM across clauses,
        optionally * log1p(factor * pr) and filtered to docs matching
        every ``required`` term in either field."""
        per: dict[tuple[int, int, str], float] = defaultdict(float)
        for clause, fld, t, w in plan:
            if fld == "c":
                plist, dlmap, avgdl, idf = (
                    self.postings.get(t), self.doclen, self.avgdl,
                    self.idf(t),
                )
            else:
                plist, dlmap, avgdl, idf = (
                    self.title_postings.get(t), self.title_len,
                    self.avgdl_title, self.idf_title(t),
                )
            if not plist:
                continue
            wi = w * idf
            for docid, tf in plist.items():
                dl = dlmap[docid]
                tfn = (
                    tf * (BM25_K1 + 1.0)
                    / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
                )
                per[(docid, clause, fld)] += wi * tfn
        clause_scores: dict[tuple[int, int], float] = {}
        for (docid, clause, _fld), s in per.items():
            key = (docid, clause)
            clause_scores[key] = max(clause_scores.get(key, 0.0), s)
        totals: dict[int, float] = defaultdict(float)
        for (docid, _clause), s in clause_scores.items():
            totals[docid] += s
        if required:
            totals = {
                d: s
                for d, s in totals.items()
                if all(
                    d in self.postings.get(t, {})
                    or d in self.title_postings.get(t, {})
                    for t in required
                )
            }
        if pagerank is not None:
            totals = {
                d: s * math.log1p(factor * pagerank.get(d, missing))
                for d, s in totals.items()
            }
        ranked = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


REFERENCE_QUERIES = {
    "q01": "java",
    "q02": "python tutorial",
    "q03": "search algorithm",
    "q04": "database index merge",
    "q05": "parse_token_id",
    "q06": "QueryParserImpl",
    "q07": "bug framework api",
    "q08": "zzznosuchterm",
    "q09": "java java java",
    "q10": "the and of",
    "q11": "java flushWrite",
    "q12": "crawl rank page link doc term",
}
