"""Exact dedup + deterministic docid assignment.

Reference semantics:
- exact dedup key = SHA-256 hex of content
  (CrawlPageUseCase.java:172-187; crawl_history.content_hash), kept as
  the per-row invariant the driver checks (`sha2(content, 256)`),
- dedup-before-enqueue is an anti-join on the hash
  (CrawlJobRepositoryJpaAdapter.java:63-66 `existsByUrlHash`).

Scale notes:
- Within-corpus dedup is a window over the hash (uniformly
  distributed -> no skew) rather than a self-anti-join.
- Docids must be deterministic under any partitioning (rank-identity
  and resume both depend on it), so they derive from data only:
  docid = (cumulative count of docs in repos < repo) + row_number
  within repo ordered by (path, commit).  The per-repo offset table
  has one row per repo; its cumsum window is a single-partition
  window over that *small* table only.  The big table never sees a
  global sort.  For corpora where one repo dominates (our fixture
  makes one repo ~20% of files), the within-repo row_number sort is
  the residual skew: if needed at 100 TB, sub-split hot repos on a
  path prefix with the same two-level offset trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.tokenizer import tokens_col, tokens_udf_col

KEY_COLS = ["repo", "path", "commit"]


def with_sha(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Add the per-row invariant column `content_sha256`."""
    return docs.withColumn("content_sha256", F.sha2(F.col(content_col), 256))


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep one deterministic representative per content_sha256.

    Representative = lexicographically smallest (repo, path, commit),
    so the survivor set is independent of partitioning.
    """
    w = Window.partitionBy("content_sha256").orderBy(*KEY_COLS)
    return (
        with_sha(docs)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_incremental(new_docs: DataFrame, seen: DataFrame) -> DataFrame:
    """Anti-join form (J2): drop new docs whose content hash is known.

    Mirrors the reference's existsByUrlHash check before enqueue
    (LinkDiscoveryConsumer.java:62-66).  `seen` needs only a
    content_sha256 column.
    """
    return dedup_exact(new_docs).join(
        seen.select("content_sha256").distinct(),
        "content_sha256",
        "left_anti",
    )


def assign_docids(deduped: DataFrame, prefix_len: int = 8) -> DataFrame:
    """Deterministic dense docids == rank over (repo, path, commit).

    Two-level scheme, fully data-derived (never partition/task ids):
    the big table is ranked within (repo, path-prefix) windows, and a
    SMALL table of per-(repo, prefix) counts turns into global
    offsets via one cumsum window.  Because the prefix is a prefix of
    path, ordering by (repo, prefix, path, commit) equals ordering by
    (repo, path, commit), so docids are identical to a single
    global rank — but no window partition exceeds one (repo, prefix)
    group, which defuses the hot-repo skew (one repo can hold ~20% of
    a corpus; its paths split across prefixes).
    """
    keyed = deduped.withColumn(
        "_pfx", F.substring("path", 1, prefix_len)
    )
    counts = keyed.groupBy("repo", "_pfx").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.orderBy("repo", "_pfx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.withColumn(
        "_offset", F.sum("_cnt").over(w_off) - F.col("_cnt")
    ).select("repo", "_pfx", "_offset")
    w_in = Window.partitionBy("repo", "_pfx").orderBy("path", "commit")
    return (
        keyed.join(F.broadcast(offsets), ["repo", "_pfx"])
        .withColumn(
            "docid",
            (F.col("_offset") + F.row_number().over(w_in) - F.lit(1)).cast("long"),
        )
        .drop("_offset", "_pfx")
    )


def title_col(path_col: str = "path"):
    """F2 title analog for a code corpus: the path basename.

    The reference extracts a page <title> per document
    (PageContentConsumer / WebPageEsDocument `title` field); for
    source files the basename (e.g. ``MergeScheduler.java``) plays
    that role, and the camel/snake-aware tokenizer splits it into the
    identifier words users type.
    """
    return F.element_at(F.split(F.col(path_col), "/"), -1)


def build_docmap(
    docs: DataFrame,
    content_col: str = "content",
    use_arrow_udf: bool = True,
) -> DataFrame:
    """documents -> docmap with tokens (content + title fields).

    Output: (docid, repo, path, commit, lang, content, content_sha256,
    tokens, doclen, title_tokens, title_len).  Tokenization runs once
    here and is shared by postings, segments, and any downstream op.
    `use_arrow_udf` selects the vectorized Arrow pandas UDF
    (north-star form); False selects the pure-JVM column-expression
    twin (same semantics, asserted equal in tests).
    """
    from search_engine_spark.ops.ranking import quality_col

    tok = tokens_udf_col(content_col) if use_arrow_udf else tokens_col(content_col)
    ttok = (
        tokens_udf_col(title_col()) if use_arrow_udf
        else tokens_col(title_col())
    )
    return (
        assign_docids(dedup_exact(docs))
        .withColumn("tokens", tok)
        .withColumn("doclen", F.size("tokens").cast("int"))
        .withColumn("title_tokens", ttok)
        .withColumn("title_len", F.size("title_tokens").cast("int"))
        # F13 quality is a static per-doc property: materialize it at
        # build time (the tokens are in hand here anyway) so serving
        # paths (search_ranked) join it instead of re-tokenizing
        # candidates' full content per query (VERDICT r3).
        .withColumn(
            "quality", quality_col(F.col(content_col), F.col("tokens"))
        )
    )
