"""URL prioritization / domain-trust scoring (reference X11/X12/F6).

Column-expression twins of the reference's pure-domain services:

- ``priority_col``: UrlPrioritizationService.calculatePriority
  (UrlPrioritizationService.java:33-46) = clamp01(
  0.4 * domain_trust + 0.3 * depth_score + 0.3 * url_characteristics).
- ``domain_trust_col`` (:51-80): fixed trust table (wikipedia 0.9,
  github/stackoverflow 0.85, medium 0.75, default 0.5) by host
  substring, then .edu -> 0.85 / .gov -> 0.80.
- ``depth_score_col`` (:85-88): max(0.1, 1 - depth * 0.3).
- ``url_characteristic_col`` (:93-121): length/query-param/session-id
  penalties, content-path bonus, admin/login/api penalty, clamped.
- ``link_priority_col``: LinkDiscoveryConsumer.calculatePriority
  (:90-105) = max(0.1, 1 - 0.1*depth + 0.5*is_main + 0.2*has_anchor).
- ``is_high_priority`` (> 0.7, :131-134) / ``should_skip`` (< 0.2,
  :139-142).
- ``admission_col``: F6 glob include/exclude admission filter — glob
  patterns compiled to anchored regexes driver-side, evaluated as ORed
  rlike column predicates (exclude wins over include, include list
  empty = admit all).

Everything is JVM column math: at 100 TB these run inside the scan
stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Verbatim from UrlPrioritizationService.java:17-28 (insertion order
# matters only for documentation; matching is by host substring with
# the explicit entries checked before the TLD rules).
DOMAIN_TRUST_SCORES: dict[str, float] = {
    "wikipedia.org": 0.9,
    "github.com": 0.85,
    "stackoverflow.com": 0.85,
    "medium.com": 0.75,
}
DEFAULT_TRUST = 0.5


def host_col(url):
    """X10 host extraction (parse_url HOST; '' and null -> null)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.parse_url(url, F.lit("HOST"))


def domain_trust_col(url):
    url = F.col(url) if isinstance(url, str) else url
    h = host_col(url)
    expr = F.lit(DEFAULT_TRUST)
    # build the when-chain back to front so earlier rules win
    expr = F.when(h.endswith(".gov"), F.lit(0.80)).otherwise(expr)
    expr = F.when(h.endswith(".edu"), F.lit(0.85)).otherwise(expr)
    for dom, score in reversed(list(DOMAIN_TRUST_SCORES.items())):
        expr = F.when(h.contains(dom), F.lit(score)).otherwise(expr)
    return F.when(h.isNull(), F.lit(DEFAULT_TRUST)).otherwise(expr)


def depth_score_col(depth):
    depth = F.col(depth) if isinstance(depth, str) else depth
    return F.greatest(F.lit(0.1), F.lit(1.0) - depth.cast("double") * 0.3)


def url_characteristic_col(url):
    url = F.col(url) if isinstance(url, str) else url
    ln = F.length(url)
    amps = ln - F.length(F.regexp_replace(url, "&", ""))
    score = F.lit(1.0)
    score = score - F.when(ln > 200, 0.3).when(ln > 100, 0.15).otherwise(0.0)
    score = score - F.when(amps > 5, 0.2).when(amps > 3, 0.1).otherwise(0.0)
    sess = (
        url.contains("sessionid")
        | url.contains("PHPSESSID")
        | url.contains("jsessionid")
    )
    score = score - F.when(sess, 0.3).otherwise(0.0)
    content = (
        url.contains("/blog/")
        | url.contains("/article/")
        | url.contains("/post/")
    )
    score = score + F.when(content, 0.2).otherwise(0.0)
    noncontent = (
        url.contains("/admin/")
        | url.contains("/login")
        | url.contains("/api/")
    )
    score = score - F.when(noncontent, 0.5).otherwise(0.0)
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), score))


def priority_col(url, depth):
    p = (
        domain_trust_col(url) * 0.4
        + depth_score_col(depth) * 0.3
        + url_characteristic_col(url) * 0.3
    )
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), p))


def is_high_priority(url, depth):
    return priority_col(url, depth) > 0.7


def should_skip(url, depth):
    return priority_col(url, depth) < 0.2


def link_priority_col(depth, is_main_content, anchor_text):
    depth = F.col(depth) if isinstance(depth, str) else depth
    m = F.col(is_main_content) if isinstance(is_main_content, str) else is_main_content
    a = F.col(anchor_text) if isinstance(anchor_text, str) else anchor_text
    p = (
        F.lit(1.0)
        - depth.cast("double") * 0.1
        + F.when(m, 0.5).otherwise(0.0)
        + F.when(a.isNotNull() & (F.length(a) > 0), 0.2).otherwise(0.0)
    )
    return F.greatest(F.lit(0.1), p)


# --- X13 pluggable prioritization strategies -------------------------------
# docs/features/url-prioritization-strategies.md — the four strategy
# formulas verbatim, as pure column math (the Redis/graph state the
# crawler versions read becomes input columns here; OPIC's cash round
# lives in ops/graph.opic_round).

STRATEGY_MAX_DEPTH = 10  # BestFirstStrategy.java MAX_DEPTH


def bfs_priority_col(depth):
    """BFS (:38-48): max(0, 100 - depth*10) — level order."""
    depth = F.col(depth) if isinstance(depth, str) else depth
    return F.greatest(
        F.lit(0.0), F.lit(100.0) - depth.cast("double") * 10.0
    )


def best_first_priority_col(pagerank, authority, depth):
    """Best-First (:70-100): (pageRank ?? 0.5)*50 +
    (domainAuthority ?? 0.5)*30 + ((MAX_DEPTH - depth)/MAX_DEPTH)*20.
    ``authority`` is the domain-authority score column (null = unknown
    domain -> the reference's 0.5 default); the depth bonus is NOT
    clamped (matches the Java)."""
    pagerank = F.col(pagerank) if isinstance(pagerank, str) else pagerank
    authority = F.col(authority) if isinstance(authority, str) else authority
    depth = F.col(depth) if isinstance(depth, str) else depth
    return (
        F.coalesce(pagerank.cast("double"), F.lit(0.5)) * 50.0
        + F.coalesce(authority.cast("double"), F.lit(0.5)) * 30.0
        + (
            (F.lit(float(STRATEGY_MAX_DEPTH)) - depth.cast("double"))
            / float(STRATEGY_MAX_DEPTH)
        )
        * 20.0
    )


def focused_relevance_col(url, keywords: list[str]):
    """FocusedCrawlingStrategy.calculateRelevance: fraction of topic
    keywords the lowercased URL contains."""
    url = F.col(url) if isinstance(url, str) else url
    low = F.lower(url)
    n = F.lit(0.0)
    for kw in keywords:
        n = n + F.when(low.contains(kw.lower()), 1.0).otherwise(0.0)
    return n / float(len(keywords))


def focused_priority_col(
    url,
    domain,
    pagerank,
    allowed_domains: list[str],
    topic_keywords: list[str],
    relevance_threshold: float,
):
    """Focused crawling (:265-305): 0 unless the domain matches the
    whitelist (contains-match; empty list = no restriction) AND URL
    relevance >= threshold; else relevance*50 + (pageRank*50 if
    present else 25)."""
    url = F.col(url) if isinstance(url, str) else url
    domain = F.col(domain) if isinstance(domain, str) else domain
    pagerank = F.col(pagerank) if isinstance(pagerank, str) else pagerank
    if allowed_domains:
        ok = F.lit(False)
        for d in allowed_domains:
            ok = ok | domain.contains(d)
    else:
        ok = F.lit(True)
    rel = focused_relevance_col(url, topic_keywords)
    boost = F.when(
        pagerank.isNotNull(), pagerank.cast("double") * 50.0
    ).otherwise(F.lit(25.0))
    return F.when(
        ok & (rel >= float(relevance_threshold)), rel * 50.0 + boost
    ).otherwise(F.lit(0.0))


def _glob_to_regex(glob: str) -> str:
    """Anchored regex for a path glob: ``*`` = any run, ``?`` = one
    char, everything else literal (the reference's include/exclude
    config shape)."""
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch in r"\.^$+{}[]|()":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"


def admission_col(path, include: list[str] | None, exclude: list[str] | None):
    """F6: glob include/exclude admission predicate.  A row is
    admitted when it matches >= 1 include pattern (or the include
    list is empty/None) AND matches no exclude pattern."""
    path = F.col(path) if isinstance(path, str) else path
    admitted = F.lit(True)
    if include:
        inc = F.lit(False)
        for g in include:
            inc = inc | path.rlike(_glob_to_regex(g))
        admitted = admitted & inc
    for g in exclude or []:
        admitted = admitted & ~path.rlike(_glob_to_regex(g))
    return admitted
