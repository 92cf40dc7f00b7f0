"""Postings + corpus statistics as plain Spark aggregates.

This is SURVEY.md A1/A2: the term-frequency map the reference computes
per doc (TextProcessingService.java:101-115) becomes
explode -> groupBy(docid, term).count(); the BM25 corpus statistics
(N, avgdl, df) the reference delegates to Lucene become plain Spark
aggregates feeding the scorer (north-star requirement).

Scale notes:
- groupBy(term, docid) partial-aggregates map-side, so hot terms
  cost O(#docs-with-term / #tasks) per task before the shuffle,
  and the (term, docid) key is fine-grained enough not to skew.
- `doclen` is denormalized into the postings (the Lucene "norms"
  trick) so query-time scoring never joins the full docmap.
- df(term) uses count(*) on the already-unique (term, docid) pairs —
  no countDistinct shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_postings(docmap: DataFrame) -> DataFrame:
    """docmap(tokens, doclen) -> postings(term, docid, tf, doclen)."""
    return (
        docmap.select("docid", "doclen", F.explode("tokens").alias("term"))
        .groupBy("term", "docid", "doclen")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("term", "docid", "tf", "doclen")
    )


def build_title_postings(docmap: DataFrame) -> DataFrame:
    """docmap(title_tokens, title_len) -> title-field postings.

    Terms live under the TITLE_PREFIX namespace so they share the
    segment store (and its (slab, bucket) layout + file pruning) with
    content terms; ``doclen`` is the title's own token count, so BM25
    length normalization uses per-field statistics (ES semantics).
    """
    from search_engine_spark.config import TITLE_PREFIX

    return (
        docmap.select(
            "docid",
            F.col("title_len").alias("doclen"),
            F.explode("title_tokens").alias("t"),
        )
        .select(
            F.concat(F.lit(TITLE_PREFIX), F.col("t")).alias("term"),
            "docid",
            "doclen",
        )
        .groupBy("term", "docid", "doclen")
        .agg(F.count("*").cast("int").alias("tf"))
        .select("term", "docid", "tf", "doclen")
    )


def build_meta_postings(docmap: DataFrame, fields) -> DataFrame:
    """docmap metadata columns -> `m#<field>=<value>` keyword postings
    (ES bool.filter namespace): exactly one posting per doc per field,
    tf=1/doclen=1 (filter chunks are never scored; the columns exist
    to share SEGMENT_SCHEMA and the whole segment pipeline — build,
    pruning inventory, splice/re-encode compaction, tombstone purge
    all apply unchanged)."""
    from functools import reduce

    from search_engine_spark.config import META_PREFIX

    parts = [
        docmap.select(
            F.concat(
                F.lit(META_PREFIX + f_ + "="), F.col(f_).cast("string")
            ).alias("term"),
            "docid",
            F.lit(1).cast("int").alias("tf"),
            F.lit(1).cast("int").alias("doclen"),
        )
        for f_ in fields
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def meta_term(field: str, value) -> str:
    """The keyword term for a (field, value) filter clause."""
    from search_engine_spark.config import META_PREFIX

    return f"{META_PREFIX}{field}={value}"


def build_df_table(postings: DataFrame) -> DataFrame:
    """postings -> (term, df): document frequency per term."""
    return postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))


def build_stats(docmap: DataFrame) -> DataFrame:
    """docmap -> single row (n_docs, avgdl)."""
    return docmap.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
