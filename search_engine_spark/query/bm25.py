"""BM25 scoring as pure JVM column math over the postings relation.

Formula (Lucene >= 8 / ES default — the reference's operative scorer,
SURVEY.md §4):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d)= tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score   = sum over query terms of idf * tfn          (OR semantics)

k1=1.2, b=0.75.  Exact document lengths (no Lucene norm quantization)
— the engine's defined semantics.  Tie-break: score desc, docid asc,
mirroring ES's internal-doc-order tiebreak deterministically.

Plan shape (the one we want at 100 TB):
- postings filtered by `term IN (...)` -> pushed to the parquet scan
  (and to partition pruning when postings are bucketed by term),
- the per-term df/idf side is tiny -> broadcast join,
- sum per docid is a partial-aggregated shuffle on docid,
- top-k is TakeOrderedAndProject (per-partition heaps + driver merge),
  never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import BM25_B, BM25_K1
from search_engine_spark.tokenizer import tokenize_query


def idf_col(df_col, n_docs: float):
    return F.log1p((F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def score_postings(
    postings: DataFrame,
    df_table: DataFrame,
    n_docs: float,
    avgdl: float,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Score all docs matching >= 1 term -> (docid, score), unsorted."""
    if not terms:
        return postings.sparkSession.createDataFrame(
            [], "docid long, score double"
        )
    cand = postings.filter(F.col("term").isin(terms))
    dfs = df_table.filter(F.col("term").isin(terms))
    tfn = (
        F.col("tf").cast("double")
        * (k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + k1 * (1.0 - b + b * F.col("doclen").cast("double") / float(avgdl))
        )
    )
    return (
        cand.join(F.broadcast(dfs), "term")
        .withColumn("_c", idf_col(F.col("df"), n_docs) * tfn)
        .groupBy("docid")
        .agg(F.sum("_c").alias("score"))
    )


def topk(scored: DataFrame, k: int = 10) -> DataFrame:
    return scored.orderBy(F.desc("score"), F.asc("docid")).limit(k)


def search_naive(
    postings: DataFrame,
    df_table: DataFrame,
    n_docs: float,
    avgdl: float,
    query: str,
    k: int = 10,
) -> DataFrame:
    """End-to-end naive (non-segment) BM25 top-k for a query string."""
    terms = tokenize_query(query)
    return topk(
        score_postings(postings, df_table, n_docs, avgdl, terms), k
    )
