"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 query end-to-end on sf0.001.
``queries()``/``oracle_sql()`` pair every implemented operator with a
DuckDB twin; the SQL strings are generated from the same tokenizer
semantics / BM25 constants the engine uses
(``search_engine_spark.oracle.sqlgen``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from search_engine_spark import contract as C
from search_engine_spark.oracle import sqlgen as O

BM25_QUERIES = {
    "bm25_q1": "key order merge scan",
    "bm25_q2": "spark filter",
    "bm25_q3": "table",
    "bm25_q4": "zzznosuchterm data",
}

# Same queries through the REAL index path (sha-dedup -> compressed
# segments -> per-slab block-max WAND); oracle twin adds the dedup CTE.
WAND_QUERIES = {
    "bm25_wand_q1": "key order merge scan",
    "bm25_wand_q2": "group data row column",
    "bm25_wand_q3": "slow",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents corpus."""
    return C.q_bm25(spark, "/root/testdata/sf0.001", "key order merge scan", 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "term_counts": partial(C.q_term_counts),
        "term_df": partial(C.q_term_df),
        "corpus_stats": partial(C.q_corpus_stats),
        "exact_dedup": partial(C.q_exact_dedup),
        "snippet": partial(C.q_snippet),
        "quality_score": partial(C.q_quality_score),
    }
    for name, text in BM25_QUERIES.items():
        q[name] = partial(C.q_bm25, query=text, k=10)
    for name, text in WAND_QUERIES.items():
        q[name] = partial(C.q_bm25_wand, query=text, k=10)
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        "term_counts": O.term_counts_sql(),
        "term_df": O.term_df_sql(),
        "corpus_stats": O.corpus_stats_sql(),
        "exact_dedup": O.exact_dedup_sql(),
        "snippet": O.snippet_sql(),
        "quality_score": O.quality_score_sql(),
    }
    for name, text in BM25_QUERIES.items():
        o[name] = O.bm25_topk_sql(text, 10)
    for name, text in WAND_QUERIES.items():
        o[name] = O.bm25_dedup_topk_sql(text, 10)
    return o
