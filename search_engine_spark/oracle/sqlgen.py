"""DuckDB oracle SQL generation for the driver contract.

Every query the engine exposes in ``__spark_entry__.queries()`` has a
DuckDB twin generated here, sharing tokenizer semantics and BM25
constants with the engine through ``search_engine_spark`` imports —
one source of truth, two dialects.

The driver registers each ``/root/testdata/sf*/{t}.parquet`` as a view
named ``{t}`` before running these.
"""

from __future__ import annotations

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.tokenizer import duckdb_tokens_sql, tokenize_query

# documents view columns: doc_id, text, lang, source, n_chars


def toks_cte() -> str:
    """CTE producing (docid, toks, doclen) from the documents view."""
    return (
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks)"
    )


def postings_cte() -> str:
    """CTEs -> postings(term, docid, tf, doclen)."""
    return (
        toks_cte() + ", "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen)"
    )


def term_counts_sql(limit: int = 100) -> str:
    return (
        "WITH " + toks_cte() + ", "
        "exploded AS (SELECT unnest(toks) AS term FROM tl) "
        "SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM exploded "
        f"GROUP BY term ORDER BY cnt DESC, term LIMIT {limit}"
    )


def term_df_sql(limit: int = 200) -> str:
    return (
        "WITH " + postings_cte() + " "
        "SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings "
        f"GROUP BY term ORDER BY df DESC, term LIMIT {limit}"
    )


def corpus_stats_sql() -> str:
    return (
        "WITH " + toks_cte() + " "
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "ROUND(avg(len(toks)), 6) AS avgdl FROM tl"
    )


def bm25_topk_sql(query: str, k: int = 10) -> str:
    terms = tokenize_query(query)
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_expanded_sql(query: str, k: int = 10) -> str:
    """Twin of contract.q_bm25_expanded: expansion weights (corrected
    originals 1.0, synonyms 0.7) come from the same verbatim reference
    maps via expand_query — one source of truth, embedded as VALUES."""
    from search_engine_spark.query.expansion import expand_query

    weights = expand_query(query)
    if not weights:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    terms_in = ", ".join(f"'{t}'" for t in weights)
    vals = ", ".join(f"('{t}', {float(w)!r})" for t, w in weights.items())
    return (
        "WITH " + postings_cte() + ", "
        f"qw(term, w) AS (SELECT * FROM (VALUES {vals})), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(q.w * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term "
        "JOIN qw q ON p.term = q.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def dedup_postings_cte() -> str:
    """postings_cte over the sha256-deduped survivor set — the corpus
    the real index path (contract._wand_index) sees."""
    return (
        "surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen)"
    )


def bm25_fuzzy_sql(
    query: str,
    k: int = 10,
    max_edits: int = 1,
    max_expansions: int = 50,
    dedup: bool = False,
) -> str:
    """Twin of contract.q_bm25_fuzzy (semantics frozen in
    query/fuzzy.py): expansion = vocabulary terms within classic
    Levenshtein <= max_edits (DuckDB's levenshtein() and Spark's
    F.levenshtein are both the classic metric), capped at
    max_expansions per query term by df desc / term asc, each clause
    boosted 1 - d/min(|q|,|t|).  ``dedup=True`` twins the real index
    path (contract.q_bm25_fuzzy_wand): corpus AND expansion
    vocabulary come from the sha-deduped survivor set."""
    terms = tokenize_query(query)
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(terms))
    return (
        "WITH " + (dedup_postings_cte() if dedup else postings_cte()) + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "vocab AS (SELECT term, CAST(count(*) AS DOUBLE) AS df "
        "FROM postings GROUP BY term), "
        f"qts(qi, qt) AS (SELECT * FROM (VALUES {vals})), "
        "exp AS (SELECT qi, v.term, v.df, "
        "1.0 - CAST(levenshtein(qt, v.term) AS DOUBLE) / "
        "least(length(qt), length(v.term)) AS boost "
        "FROM vocab v JOIN qts "
        f"ON abs(length(v.term) - length(qt)) <= {max_edits} "
        f"WHERE levenshtein(qt, v.term) <= {max_edits} "
        "QUALIFY row_number() OVER "
        f"(PARTITION BY qi ORDER BY v.df DESC, v.term ASC) <= {max_expansions}), "
        "scored AS (SELECT p.docid, "
        "SUM(e.boost * ln(1.0 + (s.n_docs - e.df + 0.5) / (e.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN exp e ON p.term = e.term CROSS JOIN stats s "
        "GROUP BY p.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_prefix_sql(prefix: str, k: int = 10, max_expansions: int = 50) -> str:
    """Twin of contract.q_bm25_prefix: scoring_boolean over the
    max_expansions highest-df vocabulary terms with the prefix."""
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "vocab AS (SELECT term, CAST(count(*) AS DOUBLE) AS df "
        "FROM postings GROUP BY term), "
        f"exp AS (SELECT term, df FROM vocab "
        f"WHERE starts_with(term, '{prefix}') "
        "QUALIFY row_number() OVER "
        f"(ORDER BY df DESC, term ASC) <= {max_expansions}), "
        "scored AS (SELECT p.docid, "
        "SUM(1.0 * ln(1.0 + (s.n_docs - e.df + 0.5) / (e.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN exp e ON p.term = e.term CROSS JOIN stats s "
        "GROUP BY p.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_dedup_topk_sql(query: str, k: int = 10) -> str:
    """BM25 top-k over the sha256-deduped survivor set — the oracle
    twin of the engine's real index path (dedup -> segments -> WAND)."""
    terms = tokenize_query(query)
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_not_sql(query: str, exclude: str, k: int = 10) -> str:
    """Exclusion (ES bool.must_not) twin of contract.q_bm25_not: the
    dedup-aware disjunctive BM25 scorer minus every document that
    contains ANY excluded term (anti-semi-join on the exploded token
    stream)."""
    terms = tokenize_query(query)
    nterms = tokenize_query(exclude)
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    if not nterms:
        return bm25_dedup_topk_sql(query, k)
    terms_in = ", ".join(f"'{t}'" for t in terms)
    nterms_in = ", ".join(f"'{t}'" for t in nterms)
    return (
        "WITH surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "excl AS (SELECT DISTINCT docid FROM postings "
        f"WHERE term IN ({nterms_in})), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) "
        "AND p.docid NOT IN (SELECT docid FROM excl) "
        "GROUP BY p.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_and_sql(query: str, k: int = 10) -> str:
    """Conjunctive (ES bool.must / SURVEY J4) twin of q_bm25_and:
    the dedup-aware BM25 scorer restricted to docs containing EVERY
    query term (count(distinct term) == n_terms)."""
    terms = tokenize_query(query)
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    return bm25_msm_sql(query, len(terms), k)


def bm25_msm_sql(query: str, m: int, k: int = 10) -> str:
    """minimum_should_match twin (contract.q_bm25_msm): the
    dedup-aware BM25 scorer restricted to docs matching at least ``m``
    DISTINCT query terms — the m-of-n middle ground between OR (m<=1)
    and bool.must (m=n).  bm25_and_sql is the m=n special case."""
    terms = tokenize_query(query)
    if not terms:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid "
        f"HAVING COUNT(DISTINCT p.term) >= {int(m)}) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_fields_sql(query: str, k: int = 10, expand: bool = False) -> str:
    """Twin of contract.q_bm25_fields: field-weighted BM25 over the
    deduped corpus — content plus title (= first text line) fields,
    each with its own df/avgdl statistics; boosts title^3/content^1
    (synonyms title^2/content^0.8) from the shared field_weights."""
    from search_engine_spark.contract import TITLE_EXPR
    from search_engine_spark.query.expansion import field_weights

    fw = field_weights(query, expand=expand)
    if not fw:
        return "SELECT CAST(NULL AS BIGINT) AS docid, CAST(NULL AS DOUBLE) AS score WHERE 1=0"
    terms_in = ", ".join(f"'{t}'" for t, _, _ in fw)
    vals = ", ".join(
        f"('{t}', {float(wc)!r}, {float(wt)!r})" for t, wc, wt in fw
    )
    tfn_c = (
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))"
    )
    tfn_t = (
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl_title)))"
    )
    return (
        "WITH surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen), "
        "ttoks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql(TITLE_EXPR)} AS toks FROM surv), "
        "ttl AS (SELECT docid, toks, len(toks) AS doclen FROM ttoks), "
        "texploded AS (SELECT docid, doclen, unnest(toks) AS term FROM ttl), "
        "tpostings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM texploded GROUP BY term, docid, doclen), "
        "stats AS (SELECT CAST((SELECT count(*) FROM tl) AS DOUBLE) AS n_docs, "
        "(SELECT avg(doclen) FROM tl) AS avgdl, "
        "(SELECT avg(doclen) FROM ttl) AS avgdl_title), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "tdfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tpostings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        f"qw(term, wc, wt) AS (SELECT * FROM (VALUES {vals})), "
        "contribs AS ("
        "SELECT p.docid, "
        "q.wc * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"{tfn_c} AS c "
        "FROM postings p JOIN dfs d ON p.term = d.term "
        "JOIN qw q ON p.term = q.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) "
        "UNION ALL "
        "SELECT p.docid, "
        "q.wt * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"{tfn_t} AS c "
        "FROM tpostings p JOIN tdfs d ON p.term = d.term "
        "JOIN qw q ON p.term = q.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in})), "
        "scored AS (SELECT docid, SUM(c) AS raw FROM contribs "
        "GROUP BY docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_full_sql(query: str, k: int = 10) -> str:
    """Twin of contract.q_bm25_full — the composed AdvancedSearchService
    query: per-clause per-field weighted BM25 sums, GREATEST across the
    two fields within a clause (BEST_FIELDS dis_max), summed across
    clauses, multiplied by ln(1 + 2*pagerank) with the deterministic
    docid pagerank fixture (contract.PR_EXPR_TMPL)."""
    from search_engine_spark.contract import PR_EXPR_TMPL, TITLE_EXPR
    from search_engine_spark.query.advanced import (
        PAGERANK_FACTOR,
        advanced_plan,
    )

    plan = advanced_plan(query)
    if not plan:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    c_terms = sorted({t for _cl, f, t, _w in plan if f == "c"})
    t_terms = sorted({t for _cl, f, t, _w in plan if f == "t"})
    c_in = ", ".join(f"'{t}'" for t in c_terms)
    t_in = ", ".join(f"'{t}'" for t in t_terms) or "''"
    vals = ", ".join(
        f"({cl}, '{f}', '{t}', {float(w)!r})" for cl, f, t, w in plan
    )
    tfn_c = (
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))"
    )
    tfn_t = (
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl_title)))"
    )
    pr_expr = PR_EXPR_TMPL.format(c="doc_id")
    return (
        "WITH surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen), "
        "ttoks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql(TITLE_EXPR)} AS toks FROM surv), "
        "ttl AS (SELECT docid, toks, len(toks) AS doclen FROM ttoks), "
        "texploded AS (SELECT docid, doclen, unnest(toks) AS term FROM ttl), "
        "tpostings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM texploded GROUP BY term, docid, doclen), "
        "stats AS (SELECT CAST((SELECT count(*) FROM tl) AS DOUBLE) AS n_docs, "
        "(SELECT avg(doclen) FROM tl) AS avgdl, "
        "(SELECT avg(doclen) FROM ttl) AS avgdl_title), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({c_in}) GROUP BY term), "
        "tdfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tpostings "
        f"WHERE term IN ({t_in}) GROUP BY term), "
        f"plan(clause, fld, term, w) AS (SELECT * FROM (VALUES {vals})), "
        "contribs AS ("
        "SELECT p.docid, q.clause, q.fld, "
        "SUM(q.w * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"{tfn_c}) AS fs "
        "FROM postings p JOIN dfs d ON p.term = d.term "
        "JOIN plan q ON p.term = q.term AND q.fld = 'c' CROSS JOIN stats s "
        "GROUP BY p.docid, q.clause, q.fld "
        "UNION ALL "
        "SELECT p.docid, q.clause, q.fld, "
        "SUM(q.w * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"{tfn_t}) AS fs "
        "FROM tpostings p JOIN tdfs d ON p.term = d.term "
        "JOIN plan q ON p.term = q.term AND q.fld = 't' CROSS JOIN stats s "
        "GROUP BY p.docid, q.clause, q.fld), "
        "per_clause AS (SELECT docid, clause, "
        "GREATEST(COALESCE(SUM(CASE WHEN fld = 'c' THEN fs END), 0.0), "
        "COALESCE(SUM(CASE WHEN fld = 't' THEN fs END), 0.0)) AS cs "
        "FROM contribs GROUP BY docid, clause), "
        "pr AS (SELECT doc_id AS docid, "
        f"{pr_expr} AS pr FROM documents), "
        "scored AS (SELECT c.docid, "
        f"SUM(c.cs) * ln(1.0 + {float(PAGERANK_FACTOR)!r} * any_value(p.pr)) AS raw "
        "FROM per_clause c JOIN pr p ON p.docid = c.docid "
        "GROUP BY c.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def highlight_sql(query: str, limit: int = 100) -> str:
    """Twin of contract.q_highlight (shared rule/constants in
    query/highlight.py)."""
    from search_engine_spark.query.highlight import highlight_snippet_sql

    terms = tokenize_query(query)
    return (
        "SELECT doc_id AS docid, "
        f"{highlight_snippet_sql('text', terms)} AS snippet "
        f"FROM documents ORDER BY doc_id LIMIT {limit}"
    )


def exact_dedup_sql() -> str:
    """Survivors of sha256 exact dedup (min doc_id per content sha)."""
    return (
        "SELECT CAST(min(doc_id) AS BIGINT) AS docid, "
        "sha256(text) AS content_sha256 "
        "FROM documents GROUP BY sha256(text) "
        "ORDER BY docid"
    )


def snippet_sql(limit: int = 100) -> str:
    """F11 snippet rule: <=200 chars; cut at last space past 100; '...'."""
    return (
        "SELECT doc_id AS docid, "
        "CASE WHEN len(text) <= 200 THEN text "
        "WHEN length(regexp_extract(substr(text, 1, 200), '^([\\s\\S]{100,199}) ', 1)) > 0 "
        "THEN regexp_extract(substr(text, 1, 200), '^([\\s\\S]{100,199}) ', 1) || '...' "
        "ELSE substr(text, 1, 200) || '...' END AS snippet "
        f"FROM documents ORDER BY doc_id LIMIT {limit}"
    )


def quality_score_sql() -> str:
    """F13 content quality score (TextProcessingService.java:131-163):
    0.3*min(len/5000,1) + 0.2*min(words/800,1) + 0.3*uniqueRatio
    + 0.2*min(avgWordLen/6,1), over the engine tokenizer's tokens."""
    return (
        "WITH " + toks_cte() + ", "
        "m AS (SELECT t.docid, length(d.text) AS nchars, t.doclen AS words, "
        "CASE WHEN t.doclen = 0 THEN 0.0 "
        "ELSE len(list_distinct(t.toks)) * 1.0 / t.doclen END AS uniq_ratio, "
        "CASE WHEN t.doclen = 0 THEN 0.0 "
        "ELSE list_aggregate(list_transform(t.toks, x -> len(x)), 'sum') * 1.0 / t.doclen END AS avg_wlen "
        "FROM tl t JOIN documents d ON d.doc_id = t.docid) "
        "SELECT docid, floor(("
        "0.3 * least(nchars / 5000.0, 1.0) + 0.2 * least(words / 800.0, 1.0) "
        "+ 0.3 * uniq_ratio + 0.2 * least(avg_wlen / 6.0, 1.0)"
        ") * 100000.0 + 0.5) / 100000.0 AS quality "
        "FROM m ORDER BY docid"
    )


# --- Round-4 additions: pagination / ranked-blend twins ---------------------

def bm25_page_sql(query: str, page: int = 1, size: int = 10) -> str:
    """W2 pagination twin: row_number() over the dedup BM25 top-k's
    (rounded score DESC, docid) total order, windowed to page
    ``page`` — LIMIT/OFFSET semantics made explicit so ties at the
    page edge resolve identically in both dialects."""
    inner = bm25_dedup_topk_sql(query, (page + 1) * size)
    return (
        f"SELECT docid, score, CAST(rn AS INT) AS rank FROM ("
        f"SELECT docid, score, row_number() OVER "
        f"(ORDER BY score DESC, docid) AS rn FROM ({inner})) "
        f"WHERE rn > {page * size} ORDER BY rn"
    )


def bm25_sorted_sql(query: str, sort_by: str, k: int = 20) -> str:
    """sortBy twin (contract.q_bm25_sorted): docs matching any query
    term, top-k by the deterministic docid-derived key (date: Lehmer
    day offset; pagerank: Knuth hash rank — ops/ranking), each hit
    with its BM25 score.  The rank division casts through DOUBLE so
    both engines perform the same single IEEE division."""
    from search_engine_spark.ops.ranking import PUBLISH_RANGE_DAYS, RANK_MOD

    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS sort_key, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    if sort_by == "date":
        key = f"CAST((docid * 16807) % {PUBLISH_RANGE_DAYS} AS DOUBLE)"
    else:
        key = (
            f"CAST((docid * 2654435761) % {RANK_MOD} AS DOUBLE) "
            f"/ CAST({RANK_MOD} AS DOUBLE)"
        )
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid), "
        f"keyed AS (SELECT docid, {key} AS sort_key FROM "
        "(SELECT DISTINCT docid FROM postings "
        f"WHERE term IN ({terms_in}))), "
        "top AS (SELECT * FROM keyed "
        f"ORDER BY sort_key DESC, docid LIMIT {k}) "
        "SELECT t.docid, t.sort_key, ROUND(s.raw, 4) AS score "
        "FROM top t JOIN scored s ON s.docid = t.docid "
        "ORDER BY t.sort_key DESC, t.docid"
    )


def bm25_after_sql(query: str, k: int = 10) -> str:
    """Keyset-pagination twin (contract.q_bm25_after): rank rows
    k+1..2k of the dedup BM25 ordering.  The oracle ranks on the RAW
    score (the Spark twin's kernel admits on full precision); the
    output rounds like every other bm25 entry.  row_number() is
    computed in a subquery because the rank window must see ALL scored
    docs, not a pre-limited page."""
    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid), "
        "ranked AS (SELECT docid, raw, row_number() OVER "
        "(ORDER BY raw DESC, docid) AS rn FROM scored) "
        "SELECT docid, ROUND(raw, 4) AS score FROM ranked "
        f"WHERE rn > {k} AND rn <= {2 * k} ORDER BY raw DESC, docid"
    )


def bm25_facets_sql(
    query: str, field: str = "source", size: int = 10
) -> str:
    """Terms-aggregation twin (contract.q_bm25_facets): match-set
    counts per field value, top buckets by (count desc, value asc)."""
    terms = tokenize_query(query)
    if not terms:
        return (
            f"SELECT CAST(NULL AS VARCHAR) AS {field}, "
            "CAST(NULL AS BIGINT) AS cnt WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH " + postings_cte() + ", "
        "cand AS (SELECT DISTINCT docid FROM postings "
        f"WHERE term IN ({terms_in})) "
        f"SELECT d.{field}, CAST(count(*) AS BIGINT) AS cnt "
        "FROM cand c JOIN documents d ON d.doc_id = c.docid "
        f"GROUP BY d.{field} "
        f"ORDER BY cnt DESC, d.{field} LIMIT {size}"
    )


def more_like_this_sql(docid: int, k: int = 10, max_terms: int = 25) -> str:
    """MLT twin (contract.q_more_like_this): the source doc's terms
    ranked by tf·idf (tie term asc), top max_terms as weight-1.0
    clauses, BM25 over the corpus minus the source doc."""
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        f"src AS (SELECT term, tf FROM postings WHERE docid = {docid}), "
        "dfs AS (SELECT p.term, CAST(count(*) AS DOUBLE) AS df "
        "FROM postings p JOIN src s ON s.term = p.term GROUP BY p.term), "
        "sel AS (SELECT s.term FROM src s JOIN dfs d ON d.term = s.term "
        "CROSS JOIN stats st "
        "ORDER BY s.tf * ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5)) "
        f"DESC, s.term LIMIT {max_terms}), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN sel ON sel.term = p.term "
        "JOIN dfs d ON d.term = p.term CROSS JOIN stats s "
        f"WHERE p.docid != {docid} GROUP BY p.docid) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_explain_sql(query: str, docid: int) -> str:
    """Explain twin (contract.q_bm25_explain): per-term breakdown for
    one (query, doc) pair, transcendental columns at 6 dp."""
    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS VARCHAR) AS term, CAST(NULL AS INT) AS tf, "
            "CAST(NULL AS BIGINT) AS df, CAST(NULL AS DOUBLE) AS idf, "
            "CAST(NULL AS DOUBLE) AS tfn, CAST(NULL AS DOUBLE) AS contrib "
            "WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "rowsx AS (SELECT p.term, CAST(p.tf AS INT) AS tf, d.df, "
        "ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf_raw, "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl))) AS tfn_raw "
        "FROM postings p JOIN dfs d ON d.term = p.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) AND p.docid = {docid}) "
        "SELECT term, tf, df, ROUND(idf_raw, 6) AS idf, "
        "ROUND(tfn_raw, 6) AS tfn, "
        "ROUND(idf_raw * tfn_raw, 6) AS contrib FROM rowsx "
        "ORDER BY idf_raw * tfn_raw DESC, term"
    )


def bm25_filtered_sql(
    query: str, field: str, value: str, k: int = 10
) -> str:
    """bool.filter twin (contract.q_bm25_filtered): the BM25 ranking
    restricted to rows whose metadata field equals the value."""
    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid) "
        "SELECT sc.docid, ROUND(sc.raw, 4) AS score FROM scored sc "
        "JOIN documents doc ON doc.doc_id = sc.docid "
        f"WHERE doc.{field} = '{value}' "
        f"ORDER BY sc.raw DESC, sc.docid LIMIT {k}"
    )


def _range_conds(day_from, day_to, min_quality, docid: str, quality: str) -> str:
    """WHERE conjuncts for the SearchRequestDTO range params: publish
    day = (docid*16807) % PUBLISH_RANGE_DAYS (the sortBy "date" key),
    quality = the shared rounded F13 formula — identical float64
    comparisons to the Spark twin on both sides of every boundary."""
    from search_engine_spark.ops.ranking import PUBLISH_RANGE_DAYS

    day = f"CAST(({docid} * 16807) % {PUBLISH_RANGE_DAYS} AS DOUBLE)"
    conds = []
    if min_quality is not None:
        conds.append(f"{quality} >= {float(min_quality)!r}")
    if day_from is not None:
        conds.append(f"{day} >= {float(day_from)!r}")
    if day_to is not None:
        conds.append(f"{day} <= {float(day_to)!r}")
    return " AND ".join(conds) if conds else "1=1"


def bm25_range_sql(
    query: str,
    day_from=None,
    day_to=None,
    min_quality=None,
    k: int = 10,
) -> str:
    """Range-filter twin (contract.q_bm25_range): the BM25 ranking
    restricted to the publish-day window + minimum content quality
    (SearchRequestDTO dateFrom/dateTo/minContentQuality)."""
    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    qual = quality_score_sql().replace("ORDER BY docid", "")
    conds = _range_conds(day_from, day_to, min_quality, "sc.docid", "q.quality")
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid), "
        f"qual AS ({qual}) "
        "SELECT sc.docid, ROUND(sc.raw, 4) AS score FROM scored sc "
        "JOIN qual q ON q.docid = sc.docid "
        f"WHERE {conds} "
        f"ORDER BY sc.raw DESC, sc.docid LIMIT {k}"
    )


def bm25_range_wand_sql(
    query: str,
    day_from=None,
    day_to=None,
    min_quality=None,
    k: int = 10,
) -> str:
    """Twin of contract.q_bm25_range_wand (the raw-admission kernel
    branch over the real compressed index): the sha256-dedup BM25
    ranking restricted to the same range predicates.  Survivors keep
    their original doc_id, so quality joins by docid against the
    all-documents quality CTE (equal text -> equal quality)."""
    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    qual = quality_score_sql().replace("ORDER BY docid", "")
    conds = _range_conds(day_from, day_to, min_quality, "sc.docid", "q.quality")
    return (
        "WITH " + dedup_postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid), "
        f"qual AS ({qual}) "
        "SELECT sc.docid, ROUND(sc.raw, 4) AS score FROM scored sc "
        "JOIN qual q ON q.docid = sc.docid "
        f"WHERE {conds} "
        f"ORDER BY sc.raw DESC, sc.docid LIMIT {k}"
    )


def search_response_sql(query: str, page: int = 1, size: int = 10) -> str:
    """Twin of contract.q_search_response: the SearchResponseDTO page
    assembly — rank window over the BM25 ranking joined to the
    SearchResultDTO projection (url=source, F11 snippet, language,
    publish-day ISO date)."""
    from search_engine_spark.ops.ranking import PUBLISH_RANGE_DAYS

    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS INT) AS rank, CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS VARCHAR) AS url, CAST(NULL AS VARCHAR) AS snippet, "
            "CAST(NULL AS DOUBLE) AS score, CAST(NULL AS VARCHAR) AS language, "
            "CAST(NULL AS VARCHAR) AS crawled_at WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    snippet = (
        "CASE WHEN length(d.text) <= 200 THEN d.text "
        "WHEN length(regexp_extract(substr(d.text, 1, 200), "
        "'^([\\s\\S]{100,199}) ', 1)) > 0 "
        "THEN regexp_extract(substr(d.text, 1, 200), "
        "'^([\\s\\S]{100,199}) ', 1) || '...' "
        "ELSE substr(d.text, 1, 200) || '...' END"
    )
    return (
        "WITH " + postings_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid), "
        "ranked AS (SELECT docid, raw, row_number() OVER "
        "(ORDER BY raw DESC, docid) AS rank FROM scored) "
        "SELECT CAST(r.rank AS INT) AS rank, r.docid, d.source AS url, "
        f"{snippet} AS snippet, ROUND(r.raw, 4) AS score, "
        "d.lang AS language, "
        "strftime(DATE '2018-01-01' + "
        f"CAST((r.docid * 16807) % {PUBLISH_RANGE_DAYS} AS INT), "
        "'%Y-%m-%d') AS crawled_at "
        "FROM ranked r JOIN documents d ON d.doc_id = r.docid "
        f"WHERE r.rank > {page * size} AND r.rank <= {(page + 1) * size} "
        "ORDER BY r.rank"
    )


def bm25_deleted_sql(query: str, k: int = 10) -> str:
    """Masked-ranking twin (contract.q_bm25_deleted): the dedup BM25
    ranking minus the documents at ranks 1, 3 and 5 — the tombstone
    invariant (scores unchanged, specific docs removed)."""
    terms = tokenize_query(query)
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    terms_in = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH surv AS (SELECT doc_id, text FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "toks AS (SELECT doc_id AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM surv), "
        "tl AS (SELECT docid, toks, len(toks) AS doclen FROM toks), "
        "exploded AS (SELECT docid, doclen, unnest(toks) AS term FROM tl), "
        "postings AS (SELECT term, docid, CAST(count(*) AS INT) AS tf, "
        "doclen FROM exploded GROUP BY term, docid, doclen), "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        "dfs AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM postings "
        f"WHERE term IN ({terms_in}) GROUP BY term), "
        "scored AS (SELECT p.docid, "
        "SUM(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(p.tf * ({BM25_K1} + 1.0) / (p.tf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * p.doclen / s.avgdl)))) AS raw "
        "FROM postings p JOIN dfs d ON p.term = d.term CROSS JOIN stats s "
        f"WHERE p.term IN ({terms_in}) GROUP BY p.docid), "
        "ranked AS (SELECT docid, raw, row_number() OVER "
        "(ORDER BY raw DESC, docid) AS rn FROM scored) "
        "SELECT docid, ROUND(raw, 4) AS score FROM ranked "
        "WHERE rn NOT IN (1, 3, 5) "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def ranked_blend_sql(query: str, k: int = 10, candidates: int = 40) -> str:
    """Twin of contract.q_ranked_blend: BM25 candidates -> min-max
    bm25norm -> quality -> 0.35/0.20 blend clamped to [0,1] (pagerank/
    ctr/freshness weights enter at 0) -> max-2-per-source -> top-k.
    ml_score rounds through the shared float formula."""
    from search_engine_spark.ops.ranking import BLEND_WEIGHTS

    cand = bm25_dedup_topk_sql(query, candidates)
    qual = quality_score_sql().replace("ORDER BY docid", "")
    # weights come from the SAME dict the Spark twin reads, so a
    # future weight change can't desynchronize oracle from engine
    blend = (
        f"({BLEND_WEIGHTS['bm25']!r} * bm25norm "
        f"+ {BLEND_WEIGHTS['quality']!r} * quality)"
    )
    clamped = f"least(greatest({blend}, 0.0), 1.0)"
    return (
        f"WITH cand AS ({cand}), qual AS ({qual}), "
        "n AS (SELECT c.docid, c.score, q.quality, "
        "CASE WHEN max(c.score) OVER () > 0 "
        "THEN c.score / max(c.score) OVER () ELSE 0.0 END AS bm25norm "
        "FROM cand c JOIN qual q ON q.docid = c.docid), "
        "m AS (SELECT n.docid, d.source, n.score, n.quality, "
        f"floor({clamped} * 100000.0 + 0.5) / 100000.0 AS ml_score "
        "FROM n JOIN documents d ON d.doc_id = n.docid) "
        "SELECT docid, source, score, quality, ml_score FROM m "
        "QUALIFY row_number() OVER (PARTITION BY source "
        "ORDER BY ml_score DESC, docid) <= 2 "
        f"ORDER BY ml_score DESC, docid LIMIT {k}"
    )


def bm25_phrase_sql(phrase: str, k: int = 10) -> str:
    """Twin of contract.q_bm25_phrase AND q_bm25_phrase_indexed (the
    two forms are identical by construction): phrase tf = count of
    start offsets i (1-based here; the Spark side is 0-based) where
    all n terms line up adjacently, scored as a single BM25
    pseudo-term with df = matching-doc count.  Adjacency is
    post-analyzer adjacency (no stopword position gaps) in both
    engines.  range(1, len-n+2) is empty when len < n, but the CASE
    guard keeps the shape parallel to the Spark side's."""
    from search_engine_spark.tokenizer import py_tokenize

    terms = py_tokenize(" ".join(phrase.strip().split())[:500])
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    n = len(terms)
    if n == 1:
        ptf = (
            "len(list_filter(toks, t -> t = '" + terms[0] + "'))"
        )
    else:
        cond = " AND ".join(
            f"list_extract(toks, i + {j}) = '{t}'" if j else
            f"list_extract(toks, i) = '{t}'"
            for j, t in enumerate(terms)
        )
        ptf = (
            f"CASE WHEN len(toks) < {n} THEN 0 ELSE "
            f"len(list_filter(range(1, len(toks) - {n} + 2), "
            f"i -> {cond})) END"
        )
    return (
        "WITH " + toks_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        f"m AS (SELECT docid, doclen, {ptf} AS ptf FROM tl), "
        "hits AS (SELECT * FROM m WHERE ptf > 0), "
        "dfp AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM hits), "
        "scored AS (SELECT h.docid, "
        "ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(h.ptf * ({BM25_K1} + 1.0) / (h.ptf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * h.doclen / s.avgdl))) AS raw "
        "FROM hits h CROSS JOIN dfp d CROSS JOIN stats s) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )


def bm25_near_sql(phrase: str, slop: int, k: int = 10) -> str:
    """Twin of contract.q_bm25_near: in-order proximity tf via the
    same greedy-chain rule (p_j = smallest position of term j greater
    than p_{j-1}; valid iff the last position exists and the total
    gap <= slop — greedy minimizes the span, so the count is exact).
    Positions are 1-based lists per term; the chain unrolls to nested
    list_min(list_filter(...)) lambdas, NULLs propagating exactly like
    the Spark side's array_min-over-filter (empty -> NULL -> the
    outer predicate is NULL -> dropped)."""
    from search_engine_spark.tokenizer import py_tokenize

    terms = py_tokenize(" ".join(phrase.strip().split())[:500])
    if not terms:
        return (
            "SELECT CAST(NULL AS BIGINT) AS docid, "
            "CAST(NULL AS DOUBLE) AS score WHERE 1=0"
        )
    n = len(terms)
    if n == 1:
        ptf = "len(list_filter(toks, t -> t = '" + terms[0] + "'))"
    else:
        def pos_of(t: str) -> str:
            return (
                "list_filter(range(1, len(toks) + 1), "
                f"i -> list_extract(toks, i) = '{t}')"
            )

        prev = "p0"
        for j in range(1, n):
            prev = (
                f"list_min(list_filter({pos_of(terms[j])}, "
                f"x -> x > {prev}))"
            )
        valid = f"{prev} - p0 - {n - 1} <= {slop}"
        ptf = (
            f"CASE WHEN len(toks) < {n} THEN 0 ELSE "
            f"len(list_filter({pos_of(terms[0])}, p0 -> {valid})) END"
        )
    return (
        "WITH " + toks_cte() + ", "
        "stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, "
        "avg(doclen) AS avgdl FROM tl), "
        f"m AS (SELECT docid, doclen, {ptf} AS ptf FROM tl), "
        "hits AS (SELECT * FROM m WHERE ptf > 0), "
        "dfp AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM hits), "
        "scored AS (SELECT h.docid, "
        "ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) * "
        f"(h.ptf * ({BM25_K1} + 1.0) / (h.ptf + {BM25_K1} * "
        f"(1.0 - {BM25_B} + {BM25_B} * h.doclen / s.avgdl))) AS raw "
        "FROM hits h CROSS JOIN dfp d CROSS JOIN stats s) "
        "SELECT docid, ROUND(raw, 4) AS score FROM scored "
        f"ORDER BY raw DESC, docid LIMIT {k}"
    )
