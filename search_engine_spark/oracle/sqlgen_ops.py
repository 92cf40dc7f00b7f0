"""DuckDB oracle SQL for the ops/ contract queries.

Structure and constants mirror contract_ops.py exactly (shared via
ops/params.py).  All hashing is md5-based so both engines agree
bit-for-bit; floats are rounded on output.
"""

from __future__ import annotations

from search_engine_spark.oracle.sqlgen import postings_cte, toks_cte
from search_engine_spark.ops.params import (
    ANN_SIGN_DIMS,
    COSINE_DUP_THRESHOLD,
    FP_PRIME,
    IVF_CENTROIDS,
    IVF_PROBES,
    JACCARD_THRESHOLD,
    LANG_MARKERS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_K,
    MINHASH_PRIME,
    MINHASH_ROWS,
    PAGERANK_D,
    PAGERANK_ITERS,
    SHINGLE_N,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_HAMMING_THRESHOLD,
)

_P = MINHASH_PRIME


# --- SimHash ---------------------------------------------------------------

def _simhash_fp_cte() -> str:
    return (
        postings_cte() + ", "
        "sterms AS (SELECT DISTINCT term FROM postings), "
        "term_bits AS (SELECT term, g.b, "
        "((strpos('0123456789abcdef', substr(md5(term), (g.b // 4) + 1, 1)) - 1)"
        " >> (3 - (g.b % 4))) & 1 AS bit "
        "FROM sterms CROSS JOIN generate_series(0, 63) g(b)), "
        "per_bit AS (SELECT p.docid, tb.b, SUM(p.tf * (2 * tb.bit - 1)) AS s "
        "FROM postings p JOIN term_bits tb USING (term) "
        "GROUP BY p.docid, tb.b), "
        "fp AS (SELECT docid, bit_or(CASE WHEN s > 0 THEN "
        "CASE WHEN b = 0 THEN -9223372036854775807 - 1 "
        "ELSE (1::BIGINT << (63 - b)) END ELSE 0 END) AS simhash "
        "FROM per_bit GROUP BY docid)"
    )


def simhash_fp_sql() -> str:
    return (
        "WITH " + _simhash_fp_cte() + " "
        "SELECT docid, simhash FROM fp ORDER BY docid"
    )


def simhash_neardup_sql() -> str:
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return (
        "WITH " + _simhash_fp_cte() + ", "
        f"bands AS (SELECT docid, simhash, g.band, "
        f"(simhash >> (g.band * {SIMHASH_BAND_BITS})) & {mask} AS band_val "
        f"FROM fp CROSS JOIN generate_series(0, {SIMHASH_BANDS - 1}) g(band)), "
        "cand AS (SELECT DISTINCT a.docid AS docid_a, b.docid AS docid_b, "
        "a.simhash AS sim_a, b.simhash AS sim_b "
        "FROM bands a JOIN bands b "
        "ON a.band = b.band AND a.band_val = b.band_val "
        "AND a.docid < b.docid) "
        "SELECT docid_a, docid_b, "
        "CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming FROM cand "
        f"WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_HAMMING_THRESHOLD} "
        "ORDER BY docid_a, docid_b"
    )


# --- MinHash ---------------------------------------------------------------

def _shingles_cte() -> str:
    n = SHINGLE_N
    return (
        toks_cte() + ", "
        "sh0 AS (SELECT docid, CASE WHEN len(toks) < {n} "
        "THEN [array_to_string(toks, ' ')] "
        "ELSE list_transform(generate_series(1, len(toks) - {n} + 1), "
        "i -> array_to_string(toks[i:i+{nm1}], ' ')) END AS shingles "
        "FROM tl), "
        "sh AS (SELECT docid, unnest(list_distinct(shingles)) AS shingle "
        "FROM sh0), "
        "shh AS (SELECT docid, shingle, "
        "(('0x' || substr(md5(shingle), 1, 15))::BIGINT) % {p} AS hm FROM sh)"
    ).format(n=n, nm1=n - 1, p=_P)


def _seeds_values() -> str:
    rows = ", ".join(
        f"({i}, {MINHASH_A[i]}, {MINHASH_B[i]}, {31 ** (i % MINHASH_ROWS)})"
        for i in range(MINHASH_K)
    )
    return f"seeds(i, a, b, pow31) AS (SELECT * FROM (VALUES {rows}))"


def _sig_cte() -> str:
    return (
        _shingles_cte() + ", " + _seeds_values() + ", "
        f"sig AS (SELECT docid, s.i, MIN((s.a * hm + s.b) % {_P}) AS minhash "
        "FROM shh CROSS JOIN seeds s GROUP BY docid, s.i)"
    )


def minhash_sig_sql() -> str:
    return (
        "WITH " + _sig_cte() + " "
        "SELECT docid, i, minhash FROM sig ORDER BY docid, i"
    )


def minhash_neardup_sql() -> str:
    r = MINHASH_ROWS
    return (
        "WITH " + _sig_cte() + ", "
        f"bands AS (SELECT docid, i // {r} AS band, "
        f"SUM((minhash % {_P}) * CAST(31 ** (i % {r}) AS BIGINT)) % {_P} AS band_val "
        "FROM sig GROUP BY docid, i // {r}), ".format(r=r) +
        "cand AS (SELECT DISTINCT a.docid AS docid_a, b.docid AS docid_b "
        "FROM bands a JOIN bands b ON a.band = b.band "
        "AND a.band_val = b.band_val AND a.docid < b.docid), "
        # hash-set verify twin (ops/minhash.shingle_hash_sets): 60-bit
        # md5-prefix hashes instead of shingle strings
        "sets_ AS (SELECT docid, list_sort(list(DISTINCT "
        "('0x' || substr(md5(shingle), 1, 15))::BIGINT)) AS sh "
        "FROM sh GROUP BY docid), "
        "verified AS (SELECT c.docid_a, c.docid_b, "
        "len(list_intersect(sa.sh, sb.sh)) * 1.0 / "
        "len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard "
        "FROM cand c JOIN sets_ sa ON sa.docid = c.docid_a "
        "JOIN sets_ sb ON sb.docid = c.docid_b) "
        "SELECT docid_a, docid_b, ROUND(jaccard, 5) AS jaccard FROM verified "
        f"WHERE jaccard >= {JACCARD_THRESHOLD} ORDER BY docid_a, docid_b"
    )


# --- Text stats ------------------------------------------------------------

def lang_id_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang, words in sorted(LANG_MARKERS.items())
        for w in words
    )
    return (
        "WITH tl AS (SELECT doc_id AS docid FROM documents), "
        f"markers(lang_pred, marker) AS (SELECT * FROM (VALUES {rows})), "
        "ex AS (SELECT doc_id AS docid, unnest(list_filter("
        "string_split_regex(lower(text), '[^a-z]+'), x -> len(x) > 0)) "
        "AS term FROM documents), "
        "hits AS (SELECT e.docid, m.lang_pred, "
        "CAST(count(*) AS BIGINT) AS hits "
        "FROM ex e JOIN markers m ON e.term = m.marker "
        "GROUP BY e.docid, m.lang_pred), "
        "best AS (SELECT docid, lang_pred, hits FROM hits "
        "QUALIFY row_number() OVER (PARTITION BY docid "
        "ORDER BY hits DESC, lang_pred) = 1) "
        "SELECT t.docid, coalesce(b.lang_pred, 'und') AS lang_pred, "
        "CAST(coalesce(b.hits, 0) AS BIGINT) AS hits "
        "FROM tl t LEFT JOIN best b ON b.docid = t.docid ORDER BY t.docid"
    )


def token_counts_sql() -> str:
    return (
        "SELECT doc_id AS docid, "
        "CAST(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE "
        "len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) "
        "AS ws_tokens, "
        "CAST(len(list_filter(string_split_regex(lower(text), "
        "'[^a-z0-9]+'), x -> len(x) > 0)) AS BIGINT) AS alnum_tokens, "
        "CAST(length(text) AS BIGINT) AS n_chars "
        "FROM documents ORDER BY docid"
    )


def fingerprint_sql() -> str:
    return (
        "WITH " + toks_cte() + ", "
        "ex AS (SELECT docid, unnest(toks) AS term, "
        "unnest(range(1, len(toks) + 1)) AS pos FROM tl), "
        "h AS (SELECT docid, pos, "
        f"(('0x' || substr(md5(term), 1, 15))::BIGINT) % {FP_PRIME} AS hv "
        "FROM ex) "
        "SELECT t.docid, CAST(coalesce(s.fp, 0) AS BIGINT) AS fingerprint "
        "FROM tl t LEFT JOIN (SELECT docid, "
        f"SUM((hv * pos) % {FP_PRIME}) % {FP_PRIME} AS fp "
        "FROM h GROUP BY docid) s ON s.docid = t.docid ORDER BY t.docid"
    )


# --- Embeddings ------------------------------------------------------------

def _round5_expr(x: str) -> str:
    """HALF_UP (away from zero) via the shared float formula
    ``sign(x) * floor(|x| * 1e5 + 0.5) / 1e5`` — the SAME expression
    the Spark tier (ops/similarity.round5_col) and the pure-Python
    serving twin (ann_index._round_half_up) use, so boundary doubles
    cannot diverge between tiers (the quality_score trap, b95a41a)."""
    return f"(sign({x}) * floor(abs({x}) * 1e5 + 0.5) / 1e5)"


def _cosine_expr(a: str, b: str) -> str:
    """Index-ordered dot/norms, identical op order to the Spark side."""
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum') / "
        f"(sqrt(list_aggregate(list_transform({a}, "
        f"x -> x::DOUBLE * x::DOUBLE), 'sum')) * "
        f"sqrt(list_aggregate(list_transform({b}, "
        f"x -> x::DOUBLE * x::DOUBLE), 'sum')))"
    )


def cosine_topk_sql(k: int = 10) -> str:
    return (
        "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) "
        "SELECT CAST(e.vec_id AS BIGINT) AS vec_id, "
        f"{_round5_expr(_cosine_expr('e.embedding', 'q.qe'))} AS cosine "
        "FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0 "
        f"ORDER BY {_cosine_expr('e.embedding', 'q.qe')} DESC, e.vec_id "
        f"LIMIT {k}"
    )


def _sign_bucket_expr(col: str) -> str:
    parts = " + ".join(
        f"(CASE WHEN {col}[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(ANN_SIGN_DIMS)
    )
    return f"({parts})"


def ann_sign_lsh_sql(k: int = 10) -> str:
    return (
        "WITH be AS (SELECT vec_id, embedding, "
        f"{_sign_bucket_expr('embedding')} AS bucket FROM embeddings), "
        "q AS (SELECT embedding AS qe, bucket AS qbucket FROM be "
        "WHERE vec_id = 0) "
        "SELECT CAST(e.vec_id AS BIGINT) AS vec_id, "
        f"{_round5_expr(_cosine_expr('e.embedding', 'q.qe'))} AS cosine "
        "FROM be e CROSS JOIN q WHERE e.bucket = q.qbucket AND e.vec_id <> 0 "
        f"ORDER BY {_cosine_expr('e.embedding', 'q.qe')} DESC, e.vec_id "
        f"LIMIT {k}"
    )


def _l2_expr(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * "
        f"({a}[i]::DOUBLE - {b}[i]::DOUBLE)), 'sum')"
    )


def ann_ivf_sql(k: int = 10) -> str:
    return (
        "WITH cent AS (SELECT vec_id AS cid, embedding AS ce "
        f"FROM embeddings WHERE vec_id < {IVF_CENTROIDS}), "
        "assigned AS (SELECT e.vec_id, e.embedding, c.cid, "
        f"{_l2_expr('e.embedding', 'c.ce')} AS d2 "
        "FROM embeddings e CROSS JOIN cent c "
        "QUALIFY row_number() OVER (PARTITION BY e.vec_id "
        "ORDER BY d2, c.cid) = 1), "
        "q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
        "probe AS (SELECT c.cid FROM cent c CROSS JOIN q "
        f"ORDER BY {_l2_expr('q.qe', 'c.ce')}, c.cid LIMIT {IVF_PROBES}) "
        "SELECT CAST(a.vec_id AS BIGINT) AS vec_id, "
        f"{_round5_expr(_cosine_expr('a.embedding', 'q.qe'))} AS cosine "
        "FROM assigned a JOIN probe p ON a.cid = p.cid CROSS JOIN q "
        "WHERE a.vec_id <> 0 "
        f"ORDER BY {_cosine_expr('a.embedding', 'q.qe')} DESC, a.vec_id "
        f"LIMIT {k}"
    )


def cosine_neardup_sql() -> str:
    """Doc-derived embedding near-dup twin of
    contract_ops.q_cosine_neardup: token-hash count vectors (dim =
    md5-60bit(term) % DOC_EMBED_DIMS, value = sum(tf)), candidates
    from the MinHash LSH bands, exact sparse cosine on candidates."""
    from search_engine_spark.ops.params import (
        DOC_COSINE_DUP_THRESHOLD,
        DOC_EMBED_DIMS,
    )

    n, nm1, r = SHINGLE_N, SHINGLE_N - 1, MINHASH_ROWS
    return (
        "WITH " + postings_cte() + ", "
        # MinHash candidate CTEs (same constants as minhash_*_sql),
        # reusing the tl CTE from postings_cte
        f"sh0 AS (SELECT docid, CASE WHEN len(toks) < {n} "
        "THEN [array_to_string(toks, ' ')] "
        f"ELSE list_transform(generate_series(1, len(toks) - {n} + 1), "
        f"i -> array_to_string(toks[i:i+{nm1}], ' ')) END AS shingles "
        "FROM tl), "
        "sh AS (SELECT docid, unnest(list_distinct(shingles)) AS shingle "
        "FROM sh0), "
        "shh AS (SELECT docid, shingle, "
        f"(('0x' || substr(md5(shingle), 1, 15))::BIGINT) % {_P} AS hm "
        "FROM sh), "
        + _seeds_values() + ", "
        f"sig AS (SELECT docid, s.i, MIN((s.a * hm + s.b) % {_P}) AS minhash "
        "FROM shh CROSS JOIN seeds s GROUP BY docid, s.i), "
        f"bands AS (SELECT docid, i // {r} AS band, "
        f"SUM((minhash % {_P}) * CAST(31 ** (i % {r}) AS BIGINT)) % {_P} "
        f"AS band_val FROM sig GROUP BY docid, i // {r}), "
        "cand AS (SELECT DISTINCT a.docid AS docid_a, b.docid AS docid_b "
        "FROM bands a JOIN bands b ON a.band = b.band "
        "AND a.band_val = b.band_val AND a.docid < b.docid), "
        # token-hash count vectors + sparse cosine on candidates only
        "vec AS (SELECT docid, "
        f"((('0x' || substr(md5(term), 1, 15))::BIGINT) % {DOC_EMBED_DIMS}) "
        "AS dim, CAST(SUM(tf) AS DOUBLE) AS v "
        "FROM postings GROUP BY docid, dim), "
        "norms AS (SELECT docid, sqrt(SUM(v * v)) AS nrm FROM vec "
        "GROUP BY docid), "
        "dots AS (SELECT c.docid_a, c.docid_b, SUM(a.v * b.v) AS dot "
        "FROM cand c JOIN vec a ON a.docid = c.docid_a "
        "JOIN vec b ON b.docid = c.docid_b AND b.dim = a.dim "
        "GROUP BY c.docid_a, c.docid_b) "
        "SELECT d.docid_a, d.docid_b, "
        f"{_round5_expr('d.dot / (na.nrm * nb.nrm)')} AS cosine "
        "FROM dots d JOIN norms na ON na.docid = d.docid_a "
        "JOIN norms nb ON nb.docid = d.docid_b "
        f"WHERE d.dot / (na.nrm * nb.nrm) >= {DOC_COSINE_DUP_THRESHOLD} "
        "ORDER BY docid_a, docid_b"
    )


# --- URL prioritization ----------------------------------------------------

def url_priority_sql() -> str:
    """Twin of contract_ops.q_url_priority — the reference's priority
    formula (UrlPrioritizationService.java:33-121) over the shared
    URL fixture expressions."""
    from search_engine_spark.contract_ops import (
        DEPTH_EXPR,
        HOST_EXPR,
        URL_EXPR,
    )

    trust = (
        "(CASE WHEN host LIKE '%wikipedia.org%' THEN 0.9::DOUBLE "
        "WHEN host LIKE '%github.com%' THEN 0.85::DOUBLE "
        "WHEN host LIKE '%stackoverflow.com%' THEN 0.85::DOUBLE "
        "WHEN host LIKE '%medium.com%' THEN 0.75::DOUBLE "
        "WHEN host LIKE '%.edu' THEN 0.85::DOUBLE "
        "WHEN host LIKE '%.gov' THEN 0.80::DOUBLE "
        "ELSE 0.5::DOUBLE END)"
    )
    # all-DOUBLE arithmetic in the same op order as the Spark columns:
    # DuckDB would otherwise use exact DECIMAL for literal math and
    # diverge from IEEE doubles by ulps at comparison boundaries
    depth_score = (
        "greatest(0.1::DOUBLE, 1.0::DOUBLE - depth::DOUBLE * 0.3::DOUBLE)"
    )
    chars = (
        "greatest(0.0::DOUBLE, least(1.0::DOUBLE, 1.0::DOUBLE "
        "- (CASE WHEN length(url) > 200 THEN 0.3::DOUBLE "
        "WHEN length(url) > 100 THEN 0.15::DOUBLE ELSE 0.0::DOUBLE END) "
        "- (CASE WHEN length(url) - length(replace(url, '&', '')) > 5 "
        "THEN 0.2::DOUBLE WHEN length(url) - length(replace(url, '&', '')) > 3 "
        "THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END) "
        "- (CASE WHEN url LIKE '%sessionid%' OR url LIKE '%PHPSESSID%' "
        "OR url LIKE '%jsessionid%' THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END) "
        "+ (CASE WHEN url LIKE '%/blog/%' OR url LIKE '%/article/%' "
        "OR url LIKE '%/post/%' THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END) "
        "- (CASE WHEN url LIKE '%/admin/%' OR url LIKE '%/login%' "
        "OR url LIKE '%/api/%' THEN 0.5::DOUBLE ELSE 0.0::DOUBLE END)))"
    )
    prio = (
        f"least(1.0::DOUBLE, greatest(0.0::DOUBLE, "
        f"{trust} * 0.4::DOUBLE + {depth_score} * 0.3::DOUBLE "
        f"+ {chars} * 0.3::DOUBLE))"
    )
    return (
        "WITH u AS (SELECT doc_id, "
        f"{HOST_EXPR} AS host, {URL_EXPR} AS url, {DEPTH_EXPR} AS depth "
        "FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"ROUND({trust}, 5) AS trust, "
        f"ROUND({prio}, 5) AS priority, "
        f"({prio}) > 0.7 AS high, "
        f"({prio}) < 0.2 AS skip "
        "FROM u ORDER BY docid"
    )


def url_priority_strategies_sql() -> str:
    """Twin of contract_ops.q_url_priority_strategies — the X13
    strategy formulas (BFS / Best-First / Focused) in the same op
    order and all-DOUBLE arithmetic as the Spark columns."""
    from search_engine_spark.contract_ops import (
        DEPTH_EXPR,
        FOCUSED_ALLOWED,
        FOCUSED_KEYWORDS,
        FOCUSED_THRESHOLD,
        HOST_EXPR,
        PR_FIX_EXPR,
        AUTH_FIX_EXPR,
        URL_EXPR,
    )

    bfs = (
        "greatest(0.0::DOUBLE, 100.0::DOUBLE - depth::DOUBLE * 10.0::DOUBLE)"
    )
    best_first = (
        "(coalesce(pr::DOUBLE, 0.5::DOUBLE) * 50.0::DOUBLE "
        "+ coalesce(auth::DOUBLE, 0.5::DOUBLE) * 30.0::DOUBLE "
        "+ ((10.0::DOUBLE - depth::DOUBLE) / 10.0::DOUBLE) * 20.0::DOUBLE)"
    )
    ok = " OR ".join(
        f"host LIKE '%{d}%'" for d in FOCUSED_ALLOWED
    )
    rel_terms = " + ".join(
        f"(CASE WHEN lower(url) LIKE '%{k.lower()}%' THEN 1.0::DOUBLE "
        "ELSE 0.0::DOUBLE END)"
        for k in FOCUSED_KEYWORDS
    )
    rel = f"(({rel_terms}) / {float(len(FOCUSED_KEYWORDS))!r}::DOUBLE)"
    boost = (
        "(CASE WHEN pr IS NOT NULL THEN pr::DOUBLE * 50.0::DOUBLE "
        "ELSE 25.0::DOUBLE END)"
    )
    focused = (
        f"(CASE WHEN ({ok}) AND {rel} >= {float(FOCUSED_THRESHOLD)!r}::DOUBLE "
        f"THEN {rel} * 50.0::DOUBLE + {boost} ELSE 0.0::DOUBLE END)"
    )
    return (
        "WITH u AS (SELECT doc_id, "
        f"{URL_EXPR} AS url, {HOST_EXPR} AS host, {DEPTH_EXPR} AS depth, "
        f"{PR_FIX_EXPR} AS pr, {AUTH_FIX_EXPR} AS auth "
        "FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"ROUND({bfs}, 5) AS bfs, "
        f"ROUND({best_first}, 5) AS best_first, "
        f"ROUND({focused}, 5) AS focused "
        "FROM u ORDER BY docid"
    )


def opic_cash_sql() -> str:
    """Twin of contract_ops.q_opic_cash: one OPIC cash round over the
    supplier->customer edge graph."""
    return (
        "WITH edges AS (SELECT DISTINCT CAST(l.l_suppkey AS BIGINT) AS src, "
        "CAST(o.o_custkey + 100000 AS BIGINT) AS dst "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey), "
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges), "
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src), "
        "received AS (SELECT e.dst AS node, "
        "SUM(1.0::DOUBLE / o.outdeg) AS recv "
        "FROM edges e JOIN outdeg o ON o.src = e.src GROUP BY e.dst) "
        "SELECT n.node, ROUND("
        "(CASE WHEN od.src IS NOT NULL THEN 0.0::DOUBLE "
        "ELSE 1.0::DOUBLE END) + coalesce(r.recv, 0.0::DOUBLE), 8) AS cash "
        "FROM nodes n LEFT JOIN received r ON r.node = n.node "
        "LEFT JOIN outdeg od ON od.src = n.node "
        "ORDER BY n.node"
    )


# --- PageRank (unrolled) ---------------------------------------------------

def pagerank_sql() -> str:
    d = PAGERANK_D
    ctes = [
        "edges AS (SELECT DISTINCT CAST(l.l_suppkey AS BIGINT) AS src, "
        "CAST(o.o_custkey + 100000 AS BIGINT) AS dst "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "pr0 AS (SELECT node, 1.0 AS score FROM nodes)",
    ]
    for t in range(PAGERANK_ITERS):
        ctes.append(
            f"c{t} AS (SELECT e.dst AS node, "
            f"SUM(p.score / o.outdeg) AS csum "
            f"FROM pr{t} p JOIN edges e ON p.node = e.src "
            "JOIN outdeg o ON o.src = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"pr{t + 1} AS (SELECT n.node, "
            f"{1.0 - d} + {d} * coalesce(c.csum, 0.0) AS score "
            f"FROM nodes n LEFT JOIN c{t} c ON c.node = n.node)"
        )
    last = f"pr{PAGERANK_ITERS}"
    return (
        "WITH " + ", ".join(ctes) + ", "
        f"tot AS (SELECT SUM(score) AS t FROM {last}) "
        f"SELECT node, ROUND(score / t, 8) AS score FROM {last} "
        "CROSS JOIN tot ORDER BY node"
    )


# --- Windows / relational coverage ----------------------------------------

def diversify_by_source_sql() -> str:
    from search_engine_spark.oracle.sqlgen import quality_score_sql

    inner = quality_score_sql().replace("ORDER BY docid", "")
    return (
        f"WITH quality AS ({inner}), "
        "j AS (SELECT q.docid, d.source, q.quality FROM quality q "
        "JOIN documents d ON d.doc_id = q.docid) "
        "SELECT docid, source, quality FROM j "
        "QUALIFY row_number() OVER (PARTITION BY source "
        "ORDER BY quality DESC, docid) <= 2 "
        "ORDER BY quality DESC, docid LIMIT 10"
    )


def spell_suggest_sql() -> str:
    return (
        "WITH " + postings_cte() + ", "
        "words(word) AS (SELECT * FROM (VALUES ('tabl'), ('qery'), "
        "('datt'), ('sparkk'))), "
        "dict AS (SELECT DISTINCT term FROM postings), "
        "j AS (SELECT w.word, d.term, levenshtein(w.word, d.term) AS dist "
        "FROM words w CROSS JOIN dict d "
        "WHERE abs(len(w.word) - len(d.term)) <= 2 "
        "AND levenshtein(w.word, d.term) <= 2) "
        "SELECT word, term AS suggestion, CAST(dist AS INT) AS dist FROM j "
        "QUALIFY row_number() OVER (PARTITION BY word "
        "ORDER BY dist, term) = 1 ORDER BY word"
    )


def status_rollup_sql() -> str:
    return (
        "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n, "
        "ROUND(SUM(o_totalprice), 2) AS total FROM orders "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


def top_customers_sql() -> str:
    return (
        "WITH rev AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS "
        "revenue FROM orders GROUP BY o_custkey) "
        "SELECT CAST(rev.o_custkey AS BIGINT) AS custkey, rev.revenue, "
        "n.n_name AS nation, r.r_name AS region "
        "FROM rev JOIN customer c ON rev.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "ORDER BY revenue DESC, custkey LIMIT 10"
    )


def freshness_decay_sql() -> str:
    return (
        "SELECT CAST(o_orderkey AS BIGINT) AS orderkey, "
        "ROUND(o_totalprice * exp(-0.01 * "
        "date_diff('day', o_orderdate, DATE '1998-12-01')) / 1000.0, 3) "
        "AS decayed_k "
        "FROM orders ORDER BY decayed_k DESC, orderkey LIMIT 20"
    )


def events_windowed_sql() -> str:
    return (
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') "
        "AS window_start, event_type, "
        "CAST(count(*) AS BIGINT) AS n, ROUND(SUM(value), 4) AS total_value "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    )


def sessionize_sql() -> str:
    return (
        "WITH g AS (SELECT user_id, event_id, ts, value, "
        "CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - "
        "lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) > 1800 "
        "THEN 1 ELSE 0 END AS new_sess FROM events), "
        "s AS (SELECT user_id, value, SUM(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS session FROM g), "
        "per AS (SELECT user_id, session, CAST(count(*) AS BIGINT) AS "
        "n_events, ROUND(SUM(value), 4) AS session_value FROM s "
        "GROUP BY user_id, session) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions, "
        "CAST(MAX(n_events) AS BIGINT) AS max_session_events, "
        "ROUND(SUM(session_value), 4) AS total_value FROM per "
        "GROUP BY user_id ORDER BY user_id"
    )


def training_pipeline_sql() -> str:
    """Composed training-data pipeline twin: subquery-composes the four
    already-verified stage oracles (exact_dedup / lang_id /
    quality_score / token_counts) with the same inner joins and the
    same thresholds as contract_ops.q_training_pipeline — one source
    of truth for each stage, so the composition cannot drift."""
    from search_engine_spark.contract_ops import (
        PIPELINE_LANG,
        PIPELINE_MIN_QUALITY,
    )
    from search_engine_spark.oracle.sqlgen import (
        exact_dedup_sql,
        quality_score_sql,
    )

    return (
        f"SELECT d.docid, l.lang_pred, q.quality, "
        f"t.ws_tokens, t.alnum_tokens, t.n_chars "
        f"FROM ({exact_dedup_sql()}) d "
        f"JOIN ({lang_id_sql()}) l ON d.docid = l.docid "
        f"JOIN ({quality_score_sql()}) q ON d.docid = q.docid "
        f"JOIN ({token_counts_sql()}) t ON d.docid = t.docid "
        f"WHERE l.lang_pred = '{PIPELINE_LANG}' "
        f"AND q.quality >= {PIPELINE_MIN_QUALITY} "
        f"ORDER BY d.docid"
    )


# --- Round-4 additions: similarity %, media byte features, streaming twin --

def simhash_similarity_sql() -> str:
    """X4 twin: (1 - hamming/64) * 100 over the near-dup pairs; exact
    binary fractions of integer inputs, so no rounding is needed."""
    return (
        f"SELECT docid_a, docid_b, hamming, "
        f"(1.0 - hamming / 64.0) * 100.0 AS similarity_pct "
        f"FROM ({simhash_neardup_sql()}) ORDER BY docid_a, docid_b"
    )


def media_features_sql() -> str:
    """Twin of contract_ops.q_media_features: the documents' UTF-8
    payload bytes recomputed as per-char ascii codes (the sf corpora
    are pure ASCII — verified at both gated scales), byte_mean as an
    exact integer-sum division, histogram16 as a comma-joined string."""
    return (
        "WITH b AS (SELECT CAST(doc_id AS BIGINT) AS media_id, "
        "CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
        "WHEN doc_id % 3 = 1 THEN 'audio/wav' "
        "ELSE 'video/mp4' END AS media_type, "
        "list_transform(range(1, length(text) + 1), "
        "i -> ascii(substr(text, i, 1))) AS bytes FROM documents) "
        "SELECT media_id, media_type, "
        "CAST(len(bytes) AS BIGINT) AS n_bytes, "
        "list_aggregate(bytes, 'sum') * 1.0 / len(bytes) AS byte_mean, "
        "array_to_string(list_transform(range(0, 16), "
        "h -> CAST(len(list_filter(bytes, x -> x // 16 = h)) AS VARCHAR)"
        "), ',') AS h16 "
        "FROM b ORDER BY media_id"
    )


def chunk_documents_sql() -> str:
    """Twin of contract_ops.q_chunk_documents: identical token
    windows (starts 0, stride, ... < n; stride = max - overlap) over
    the same tokenizer semantics, via unnest(range()) + list_slice
    (1-based, end-clamped — same convention as Spark's slice)."""
    from search_engine_spark.contract_ops import (
        CHUNK_MAX_TOKENS,
        CHUNK_OVERLAP,
    )
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    stride = CHUNK_MAX_TOKENS - CHUNK_OVERLAP
    return (
        "WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "starts AS (SELECT docid, toks, "
        f"unnest(range(0, len(toks), {stride})) AS start FROM toks) "
        "SELECT docid, "
        f"CAST(start // {stride} AS INT) AS chunk_id, "
        "CAST(len(list_slice(toks, start + 1, "
        f"start + {CHUNK_MAX_TOKENS})) AS INT) AS n_tokens, "
        "array_to_string(list_slice(toks, start + 1, "
        f"start + {CHUNK_MAX_TOKENS}), ' ') AS chunk "
        "FROM starts ORDER BY docid, chunk_id"
    )


def pack_examples_sql() -> str:
    """Twin of contract_ops.q_pack_examples: the same global token
    stream (window cumsum over docid order — fine at oracle scale;
    the Spark side uses the distributed two-phase form) split at the
    same context length, pieces re-assembled in gstart order."""
    from search_engine_spark.contract_ops import PACK_CONTEXT_LEN
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    n = PACK_CONTEXT_LEN
    return (
        "WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "nz AS (SELECT docid, toks, CAST(len(toks) AS BIGINT) AS n "
        "FROM toks WHERE len(toks) > 0), "
        "ord AS (SELECT *, CAST(SUM(n) OVER (ORDER BY docid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n "
        "AS BIGINT) AS gstart FROM nz), "
        "spans AS (SELECT *, "
        f"unnest(range(gstart // {n}, (gstart + n - 1) // {n} + 1)) "
        "AS example_id FROM ord), "
        "pieces AS (SELECT example_id, docid, gstart, "
        f"list_slice(toks, greatest(example_id * {n}, gstart) "
        "- gstart + 1, "
        f"least((example_id + 1) * {n}, gstart + n) - gstart) "
        "AS piece FROM spans) "
        "SELECT example_id, "
        "CAST(SUM(len(piece)) AS INT) AS n_tokens, "
        "CAST(COUNT(DISTINCT docid) AS INT) AS n_docs, "
        "string_agg(array_to_string(piece, ' '), ' ' "
        "ORDER BY gstart) AS text "
        "FROM pieces GROUP BY example_id ORDER BY example_id"
    )


def scrub_pii_sql() -> str:
    """Twin of contract_ops.q_scrub_pii: the same dialect-neutral
    patterns (plain character classes, counted repetition, no
    lookaround — identical under Java regex and RE2) over the same
    synthesized PII suffix."""
    from search_engine_spark.ops.scrub import (
        EMAIL_MASK,
        EMAIL_RE,
        IP_MASK,
        IPV4_RE,
        PHONE_MASK,
        PHONE_RE,
    )

    return (
        "WITH inp AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        "text || ' reach user' || CAST(doc_id AS VARCHAR) || "
        "'@corp.example.com via 10.' || "
        "CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
        "CAST(doc_id % 100 AS VARCHAR) || ' tel +1555' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0') AS content "
        "FROM documents) "
        "SELECT docid, "
        f"CAST(len(regexp_extract_all(content, '{EMAIL_RE}', 0)) "
        "AS INT) AS n_emails, "
        f"CAST(len(regexp_extract_all(content, '{IPV4_RE}', 0)) "
        "AS INT) AS n_ips, "
        f"CAST(len(regexp_extract_all(content, '{PHONE_RE}', 0)) "
        "AS INT) AS n_phones, "
        "regexp_replace(regexp_replace(regexp_replace(content, "
        f"'{EMAIL_RE}', '{EMAIL_MASK}', 'g'), "
        f"'{IPV4_RE}', '{IP_MASK}', 'g'), "
        f"'{PHONE_RE}', '{PHONE_MASK}', 'g') AS scrubbed "
        "FROM inp ORDER BY docid"
    )


def codec_roundtrip_sql() -> str:
    """Twin of contract_ops.q_codec_roundtrip: constant 16x16 images
    roundtrip EXACTLY through every codec (JPEG's DC-only blocks are
    bit-exact at quant=1), so geometry and Rec.601 luma are stated in
    closed form; the corrupt class (doc_id % 6 = 5) yields the
    quarantined ok=false row with NULL geometry.  The luma expression
    ``v*0.299 + v*0.587 + v*0.114`` is the SAME left-associated IEEE
    double chain numpy evaluates per pixel (all pixels identical, and
    a 256-element mean of identical doubles is exact) — the CASTs
    matter: bare 0.299 is DECIMAL in DuckDB, which computes v*1.000
    exactly while the double chain lands one ulp below for 65 of the
    256 values."""
    return (
        "SELECT CAST(doc_id AS BIGINT) AS media_id, "
        "CASE doc_id % 6 WHEN 0 THEN 'ppm' WHEN 1 THEN 'png' "
        "WHEN 2 THEN 'jpeg' WHEN 3 THEN 'gif' WHEN 4 THEN 'webp' "
        "ELSE 'corrupt' END AS codec, "
        "doc_id % 6 <> 5 AS ok, "
        "CASE WHEN doc_id % 6 <> 5 THEN 16 END AS width, "
        "CASE WHEN doc_id % 6 <> 5 THEN 16 END AS height, "
        "CASE WHEN doc_id % 6 <> 5 THEN 3 END AS channels, "
        "CASE WHEN doc_id % 6 <> 5 THEN "
        "(doc_id % 256) * CAST(0.299 AS DOUBLE) "
        "+ (doc_id % 256) * CAST(0.587 AS DOUBLE) "
        "+ (doc_id % 256) * CAST(0.114 AS DOUBLE) END AS mean_luma "
        "FROM documents WHERE doc_id < 400 ORDER BY media_id"
    )


def sessionize_stream_sql() -> str:
    """Twin of contract_ops.q_sessionize_stream: the batch lag+cumsum
    gap split (identical to sessionize_sql's CTEs) emitted per session
    with start/end epochs, filtered to sessions the stream's FINAL
    watermark (max event time - 2h) has sealed — the same
    ``session_end + gap <= watermark`` predicate
    streaming_sessionize.split_final applies, floor-second exact (the
    ms-truncated Spark watermark and DuckDB's floor(epoch()) agree —
    see the contract docstring)."""
    return (
        "WITH g AS (SELECT user_id, event_id, ts, value, "
        "CAST(floor(epoch(ts)) AS BIGINT) AS es, "
        "CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - "
        "lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) > 1800 "
        "THEN 1 ELSE 0 END AS new_sess FROM events), "
        "s AS (SELECT user_id, value, es, SUM(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS session FROM g), "
        "per AS (SELECT CAST(user_id AS BIGINT) AS user_id, session, "
        "MIN(es) AS session_start, MAX(es) AS session_end, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "ROUND(SUM(value), 4) AS session_value FROM s "
        "GROUP BY user_id, session), "
        "wm AS (SELECT MAX(CAST(floor(epoch(ts)) AS BIGINT)) - 7200 "
        "AS wm FROM events) "
        "SELECT user_id, session_start, session_end, n_events, "
        "session_value FROM per, wm WHERE session_end + 1800 <= wm "
        "ORDER BY user_id, session_start"
    )


def dup_spans_sql() -> str:
    """Twin of contract_ops.q_dup_spans: identical trigram strings
    (list_slice == Spark slice, space-joined) hashed with the same
    md5-60bit idiom; a position is duplicated when its hash count
    across the corpus is >= 2."""
    from search_engine_spark.ops.params import CURATION_NGRAM_N
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    n = CURATION_NGRAM_N
    return (
        "WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "pos AS (SELECT docid, ('0x' || substr(md5(gram), 1, 15))::BIGINT "
        "AS h FROM (SELECT docid, "
        f"unnest(list_transform(range(0, greatest(len(toks) - {n - 1}, 0)), "
        f"i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))) "
        "AS gram FROM toks)), "
        "cnt AS (SELECT h, count(*) AS c FROM pos GROUP BY h), "
        "per AS (SELECT docid, count(*) AS n_ngrams, "
        "sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS n_dup "
        "FROM pos JOIN cnt USING (h) GROUP BY docid) "
        "SELECT t.docid, "
        "CAST(coalesce(per.n_ngrams, 0) AS BIGINT) AS n_ngrams, "
        "CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup, "
        "CASE WHEN coalesce(per.n_ngrams, 0) > 0 THEN "
        "CAST(per.n_dup AS DOUBLE) / CAST(per.n_ngrams AS DOUBLE) "
        "ELSE CAST(0.0 AS DOUBLE) END AS dup_frac "
        "FROM toks t LEFT JOIN per ON t.docid = per.docid "
        "ORDER BY t.docid"
    )


def decontaminate_sql() -> str:
    """Twin of contract_ops.q_decontaminate: eval set = distinct
    trigrams of docid % DECON_EVAL_MOD == 0; n_hits counts corpus
    gram POSITIONS present in that set."""
    from search_engine_spark.ops.params import (
        CURATION_NGRAM_N,
        DECON_EVAL_MOD,
    )
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    n, m = CURATION_NGRAM_N, DECON_EVAL_MOD
    return (
        "WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "grams AS (SELECT docid, "
        f"unnest(list_transform(range(0, greatest(len(toks) - {n - 1}, 0)), "
        f"i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))) "
        "AS gram FROM toks), "
        f"ev AS (SELECT DISTINCT gram FROM grams WHERE docid % {m} = 0), "
        "hits AS (SELECT g.docid, count(*) AS c FROM grams g "
        f"JOIN ev USING (gram) WHERE g.docid % {m} != 0 GROUP BY g.docid) "
        "SELECT t.docid, CAST(coalesce(hits.c, 0) AS BIGINT) AS n_hits, "
        "coalesce(hits.c, 0) > 0 AS contaminated "
        f"FROM toks t LEFT JOIN hits ON t.docid = hits.docid "
        f"WHERE t.docid % {m} != 0 ORDER BY t.docid"
    )


def gopher_quality_sql() -> str:
    """Twin of contract_ops.q_gopher_quality: raw whitespace words,
    mean_word_len = CAST(sum AS DOUBLE)/n (the same single IEEE
    division Spark's long/long emits), top bigram count via the same
    two-level aggregation; thresholds from ops/params.py."""
    from search_engine_spark.ops.params import (
        GOPHER_MWL_MAX,
        GOPHER_MWL_MIN,
        GOPHER_TOP_BIGRAM_MAX,
    )

    return (
        "WITH w AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        "CASE WHEN len(trim(text)) = 0 THEN [] "
        "ELSE string_split_regex(trim(text), '\\s+') END AS words "
        "FROM documents), "
        "base AS (SELECT docid, CAST(len(words) AS BIGINT) AS n_words, "
        "CAST(coalesce(list_aggregate(list_transform(words, "
        "x -> len(x)), 'sum'), 0) AS BIGINT) AS sum_len, words FROM w), "
        "bg AS (SELECT docid, unnest(list_transform("
        "range(1, len(words)), i -> words[i] || ' ' || words[i + 1])) "
        "AS b FROM base WHERE n_words >= 2), "
        "bc AS (SELECT docid, b, count(*) AS c FROM bg GROUP BY 1, 2), "
        "top AS (SELECT docid, CAST(max(c) AS BIGINT) AS top_c "
        "FROM bc GROUP BY docid), "
        "st AS (SELECT base.docid, n_words, "
        "CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / "
        "CAST(n_words AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END "
        "AS mean_word_len, "
        "CASE WHEN n_words > 1 THEN CAST(coalesce(top_c, 0) AS DOUBLE) "
        "/ CAST(n_words - 1 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END "
        "AS top_bigram_frac "
        "FROM base LEFT JOIN top ON base.docid = top.docid) "
        "SELECT docid, n_words, mean_word_len, top_bigram_frac, "
        f"(mean_word_len >= CAST({GOPHER_MWL_MIN} AS DOUBLE) AND "
        f"mean_word_len <= CAST({GOPHER_MWL_MAX} AS DOUBLE) AND "
        f"top_bigram_frac <= CAST({GOPHER_TOP_BIGRAM_MAX} AS DOUBLE)) "
        "AS keep FROM st ORDER BY docid"
    )


def sample_stratified_sql() -> str:
    """Twin of contract_ops.q_sample_stratified: the identical
    md5-60bit(CAST(docid AS VARCHAR)) % SAMPLE_BUCKETS bucket against
    the per-language per-mille rates from ops/params.py."""
    from search_engine_spark.ops.params import (
        SAMPLE_BUCKETS,
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
    )

    cases = " ".join(
        f"WHEN '{lang}' THEN {rate}"
        for lang, rate in sorted(SAMPLE_RATES.items())
    )
    return (
        "WITH d AS (SELECT CAST(doc_id AS BIGINT) AS docid, lang, "
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT "
        f"% {SAMPLE_BUCKETS} AS bucket FROM documents) "
        "SELECT docid, lang, CAST(bucket AS BIGINT) AS bucket FROM d "
        f"WHERE bucket < CASE lang {cases} ELSE {SAMPLE_DEFAULT_RATE} END "
        "ORDER BY docid"
    )


def dup_span_ranges_sql() -> str:
    """Twin of contract_ops.q_dup_span_ranges: same md5-60bit gram
    hash, same count >= 2 duplicate rule, same pos - row_number()
    island key."""
    from search_engine_spark.ops.params import CURATION_NGRAM_N
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    n = CURATION_NGRAM_N
    return (
        "WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "pos AS (SELECT docid, i AS pos, "
        "('0x' || substr(md5(gram), 1, 15))::BIGINT AS h FROM "
        "(SELECT docid, unnest(range(0, greatest(len(toks) "
        f"- {n - 1}, 0))) AS i, "
        f"unnest(list_transform(range(0, greatest(len(toks) - {n - 1}, "
        f"0)), j -> array_to_string(list_slice(toks, j + 1, j + {n}), "
        "' '))) AS gram FROM toks)), "
        "dup AS (SELECT h FROM pos GROUP BY h HAVING count(*) >= 2), "
        "dpos AS (SELECT docid, pos FROM pos JOIN dup USING (h)), "
        "isl AS (SELECT docid, pos, pos - row_number() OVER "
        "(PARTITION BY docid ORDER BY pos) AS island FROM dpos) "
        "SELECT docid, CAST(min(pos) AS BIGINT) AS span_start, "
        f"CAST(max(pos) - min(pos) + {n} AS BIGINT) AS span_tokens, "
        "CAST(count(*) AS BIGINT) AS n_positions "
        "FROM isl GROUP BY docid, island "
        "ORDER BY docid, span_start"
    )


def lm_score_sql() -> str:
    """Twin of contract_ops.q_lm_score: same unigram probability
    table, ln() and exp() with the same ROUND contract as the BM25 /
    freshness oracles (drift ~1e-12 vs rounding at 1e-6/1e-4)."""
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    return (
        "WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS docid, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "ex AS (SELECT docid, unnest(toks) AS term FROM toks), "
        "vocab AS (SELECT term, count(*) AS tf FROM ex GROUP BY term), "
        "tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM vocab), "
        "logp AS (SELECT term, ln(CAST(tf AS DOUBLE) / "
        "CAST(total AS DOUBLE)) AS logp FROM vocab, tot), "
        "per AS (SELECT docid, CAST(count(*) AS BIGINT) AS n_toks, "
        "-sum(logp) / count(*) AS xent_raw "
        "FROM ex JOIN logp USING (term) GROUP BY docid) "
        "SELECT t.docid, "
        "CAST(coalesce(per.n_toks, 0) AS BIGINT) AS n_toks, "
        "ROUND(coalesce(per.xent_raw, 0.0), 6) AS xent, "
        "ROUND(exp(coalesce(per.xent_raw, 0.0)), 4) AS ppl "
        "FROM toks t LEFT JOIN per ON t.docid = per.docid "
        "ORDER BY t.docid"
    )


def hll_vocab_sql() -> str:
    """Twin of contract_ops.q_hll_vocab: identical 60-bit md5-prefix
    hash, idx = h % m / w = h >> p register split, rank via
    length(bin(w)) (minimal-digit semantics match Spark's F.bin),
    INTEGER harmonic sum 2^(49-rank), and the same fixed-order
    estimate expression — bit-exact across engines (ops/sketches.py
    freezes the construction)."""
    from search_engine_spark.ops.sketches import (
        HLL_ALPHA_EXPR,
        HLL_M,
        HLL_P,
        HLL_WBITS,
    )
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    top = 1 << (HLL_WBITS + 1)
    r0 = HLL_WBITS + 1
    return (
        "WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS docid, source AS src, "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "it AS (SELECT src, unnest(toks) AS term FROM toks), "
        "hashed AS (SELECT src, "
        "('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM it), "
        f"regs AS (SELECT src, h % {HLL_M} AS idx, "
        f"max(CASE WHEN (h >> {HLL_P}) = 0 THEN {r0} "
        f"ELSE {r0} - length(bin(h >> {HLL_P})) END) AS rank "
        "FROM hashed GROUP BY src, idx), "
        "agg AS (SELECT src, "
        f"SUM(CAST(pow(2.0, {r0} - rank) AS BIGINT)) AS isum, "
        "COUNT(*) AS present FROM regs GROUP BY src), "
        "est AS (SELECT src, "
        f"{HLL_ALPHA_EXPR} * {HLL_M}.0 * {HLL_M}.0 / "
        f"((CAST(isum AS DOUBLE) + CAST({HLL_M} - present AS DOUBLE) * "
        f"{top}.0) / {top}.0) AS raw, "
        f"{HLL_M} - present AS zeros FROM agg) "
        "SELECT src, ROUND(CASE WHEN raw <= 2.5 * "
        f"{HLL_M} AND zeros > 0 "
        f"THEN {HLL_M}.0 * ln({HLL_M}.0 / CAST(zeros AS DOUBLE)) "
        "ELSE raw END, 3) AS est FROM est ORDER BY src"
    )


def cms_term_freq_sql() -> str:
    """Twin of contract_ops.q_cms_term_freq: same '#cms{j}' salted
    md5-prefix hashes, depth x width cells, min-over-depth point
    estimates — integer-exact."""
    from search_engine_spark.contract_ops import CMS_PROBES
    from search_engine_spark.ops.sketches import CMS_DEPTH, CMS_WIDTH
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    probes = ", ".join(f"('{t}')" for t in CMS_PROBES)
    hash_expr = (
        "('0x' || substr(md5(term || '#cms' || CAST(j AS VARCHAR)), 1, 15))"
        f"::BIGINT % {CMS_WIDTH}"
    )
    return (
        "WITH toks AS (SELECT "
        f"{duckdb_tokens_sql('text')} AS toks FROM documents), "
        "it AS (SELECT unnest(toks) AS term FROM toks), "
        f"cells AS (SELECT j, {hash_expr} AS bucket "
        f"FROM it, range({CMS_DEPTH}) r(j)), "
        "sk AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt "
        "FROM cells GROUP BY j, bucket), "
        f"probes(term) AS (SELECT * FROM (VALUES {probes})), "
        f"pj AS (SELECT term, j, {hash_expr} AS bucket "
        f"FROM probes, range({CMS_DEPTH}) r(j)) "
        "SELECT pj.term, MIN(COALESCE(sk.cnt, 0)) AS est "
        "FROM pj LEFT JOIN sk ON pj.j = sk.j AND pj.bucket = sk.bucket "
        "GROUP BY pj.term ORDER BY pj.term"
    )


def bpe_merges_sql(n_merges: int = 12) -> str:
    """Twin of contract.q_bpe_merges (ops/bpe.py): the full BPE
    training loop replayed as chained MATERIALIZED CTE stages — one
    (pair counts -> argmax -> literal-replace merge) block per round
    (non-materialized CTEs would inline the argmax 3x per round: a
    3^n plan blowup).  The DOUBLE-SPACE symbol representation makes
    the flat leftmost-nonoverlapping `replace` exactly the reference
    left-to-right merge walk (see ops/bpe.py docstring), identical
    across DuckDB / Spark, so the learned merges compare
    hash-exactly against the Spark twin and both against the
    independent index-walk Python reference."""
    from search_engine_spark.tokenizer import duckdb_tokens_sql

    parts = [
        "WITH wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq "
        "FROM (SELECT unnest("
        + duckdb_tokens_sql("text")
        + ") AS word FROM documents) GROUP BY word), "
        "w0 AS MATERIALIZED (SELECT "
        "regexp_replace(word, '(.)', '\\1  ', 'g') || '</w>' "
        "AS sym, freq FROM wf)"
    ]
    for i in range(1, int(n_merges) + 1):
        prev = f"w{i - 1}"
        parts.append(
            f", p{i} AS MATERIALIZED (SELECT u.pair, SUM(w.freq) AS cnt "
            f"FROM {prev} w, unnest(list_transform("
            "range(1, len(string_split(w.sym, '  '))), "
            "j -> string_split(w.sym, '  ')[j] || ' ' || "
            "string_split(w.sym, '  ')[j + 1])) AS u(pair) "
            "GROUP BY u.pair)"
            f", m{i} AS MATERIALIZED (SELECT pair, cnt, "
            "replace(pair, ' ', '') AS merged "
            f"FROM p{i} ORDER BY cnt DESC, pair LIMIT 1)"
            f", w{i} AS MATERIALIZED (SELECT trim(replace(' ' || sym || ' ', "
            f"' ' || replace((SELECT pair FROM m{i}), ' ', '  ') || ' ', "
            f"' ' || (SELECT merged FROM m{i}) || ' ')) AS sym, freq "
            f"FROM {prev})"
            f", s{i} AS (SELECT {i} AS rank, "
            "string_split(pair, ' ')[1] AS \"left\", "
            "string_split(pair, ' ')[2] AS \"right\", cnt "
            f"FROM m{i})"
        )
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, int(n_merges) + 1))
    parts.append(
        f" SELECT CAST(rank AS INT) AS rank, \"left\", \"right\", "
        f"CAST(cnt AS BIGINT) AS cnt FROM ({union}) ORDER BY rank"
    )
    return "".join(parts)
