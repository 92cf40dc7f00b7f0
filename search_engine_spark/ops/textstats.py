"""Text-analysis operators for the training-data pipeline:
language-ID (marker-word heuristic), token counting, document
fingerprinting (position-weighted rolling hash), plus the reference's
content-quality score lives in contract.q_quality_score (F13).

Everything is JVM column math with exact-integer hashing so the
DuckDB oracle can reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from search_engine_spark.ops.params import FP_PRIME, LANG_MARKERS

_P = FP_PRIME


def _markers_df(spark):
    rows = [
        (lang, w) for lang, words in sorted(LANG_MARKERS.items()) for w in words
    ]
    return spark.createDataFrame(rows, "lang_pred string, marker string")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(docid, text) -> (docid, lang_pred, hits).

    Argmax of marker-word hits per language; ties broken by language
    code ascending; zero hits -> 'und'.  (The reference's language
    detection reads html[lang] — HtmlParserService.java:155-171; for
    raw text this heuristic replaces it.)  Works on RAW lowercase
    words — deliberately NOT the engine tokenizer, whose stopword
    filter would delete exactly the words that identify a language.
    """
    spark = docs.sparkSession
    docs_toks = docs.select("docid")
    ex = docs.select(
        "docid",
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[^a-z]+")
        ).alias("term"),
    ).filter(F.length("term") > 0)
    hits = (
        ex.join(F.broadcast(_markers_df(spark)), ex.term == F.col("marker"))
        .groupBy("docid", "lang_pred")
        .agg(F.count("*").cast("long").alias("hits"))
    )
    w = Window.partitionBy("docid").orderBy(F.desc("hits"), F.asc("lang_pred"))
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("docid", "lang_pred", "hits")
    )
    return (
        docs_toks.select("docid")
        .join(best, "docid", "left")
        .select(
            "docid",
            F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
            F.coalesce("hits", F.lit(0)).alias("hits"),
        )
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(docid, text) -> whitespace / alnum-token / char counts."""
    ws = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    alnum = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        )
    )
    return docs.select(
        "docid",
        ws.cast("long").alias("ws_tokens"),
        alnum.cast("long").alias("alnum_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def fingerprints(docs_toks: DataFrame) -> DataFrame:
    """(docid, toks) -> (docid, fingerprint) rolling position-weighted
    hash: sum over positions of (md5-60bit(term) mod P) * (pos+1), mod P.
    Order-sensitive (token order matters), unlike the simhash."""
    ex = docs_toks.select(
        "docid", F.posexplode("toks").alias("pos", "term")
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long") % _P,
    )
    return (
        ex.groupBy("docid")
        .agg((F.sum(F.col("h") * (F.col("pos") + 1) % _P) % _P).alias("fingerprint"))
        .join(docs_toks.select("docid"), "docid", "right")
        .select(
            "docid",
            F.coalesce("fingerprint", F.lit(0)).cast("long").alias("fingerprint"),
        )
    )
