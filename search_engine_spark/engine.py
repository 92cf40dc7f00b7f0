"""SearchEngine facade: build once, query many.

The query path is the Spark-native analog of the reference's intended
search lifecycle (SURVEY.md §3.1): query string -> shared tokenizer ->
segment scan pruned to query terms (partition/file pruning on the
term-bucketed, slab-partitioned segments table) -> per-slab block-max
WAND inside applyInPandas -> global TakeOrdered merge -> docmap join
for metadata/snippets.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer.build import build_index
from search_engine_spark.query.wand import TOPK_SCHEMA, make_slab_scorer
from search_engine_spark.tokenizer import tokenize_query


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = True):
        self.spark = spark
        self.index_dir = index_dir
        with open(f"{index_dir}/meta.json") as f:
            self.meta = json.load(f)
        self.segments = spark.read.parquet(f"{index_dir}/segments")
        self.df_table = spark.read.parquet(f"{index_dir}/df")
        self.docmap = spark.read.parquet(f"{index_dir}/docmap")
        if cache:
            self.segments = self.segments.cache()
            self.df_table = self.df_table.cache()

    # -- construction ----------------------------------------------------
    @staticmethod
    def build(
        spark: SparkSession,
        docs: DataFrame,
        index_dir: str,
        cfg: EngineConfig | None = None,
        **kwargs,
    ) -> "SearchEngine":
        build_index(spark, docs, index_dir, cfg, **kwargs)
        return SearchEngine(spark, index_dir)

    # -- query -----------------------------------------------------------
    def _pruned_segments(self, terms: list[str]):
        """Segment scan pruned by term AND bucket.

        Each segment file holds one bucket (see build.py), so the
        bucket predicate — computed driver-side with the crc32 twin —
        skips whole files via parquet min/max stats; the term
        predicate then prunes row groups / rows.
        """
        from search_engine_spark.indexer.segments import term_bucket_py

        buckets = sorted(
            {term_bucket_py(t, int(self.meta["term_buckets"])) for t in terms}
        )
        return self.segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def _idf_rows(self, terms: list[str]):
        n = float(self.meta["n_docs"])
        rows = (
            self.df_table.filter(F.col("term").isin(terms))
            .withColumn(
                "idf",
                F.log1p((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            )
            .select("term", "idf")
        )
        return rows

    def search(self, query: str, k: int = 10) -> DataFrame:
        """Top-k (docid, score) via per-slab block-max WAND."""
        terms = tokenize_query(query)
        if not terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        m = self.meta
        seg = self._pruned_segments(terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        seg = seg.join(F.broadcast(self._idf_rows(terms)), "term")
        bound_scale = max(1.0, float(m["avgdl"]) / float(m["norm_avgdl"]))
        scorer = make_slab_scorer(
            int(m["slab_size"]),
            int(m["block_size"]),
            k,
            float(m["k1"]),
            float(m["b"]),
            float(m["avgdl"]),
            bound_scale,
        )
        per_slab = seg.groupBy("slab").applyInPandas(scorer, schema=TOPK_SCHEMA)
        return per_slab.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def search_batch(self, queries: dict[str, str], k: int = 10) -> DataFrame:
        """Score MANY queries in one job -> (qid, docid, score, rank).

        The throughput path: a (qid, term, idf) broadcast joins the
        segments scan once; (qid, slab) groups run WAND concurrently;
        a per-qid ranking window takes the global top-k.
        """
        from search_engine_spark.query.wand import (
            BATCH_TOPK_SCHEMA,
            make_batch_slab_scorer,
        )
        from pyspark.sql import Window

        m = self.meta
        n = float(m["n_docs"])
        q_terms = []
        for qid, q in queries.items():
            for t in tokenize_query(q):
                q_terms.append((qid, t))
        if not q_terms:
            return self.spark.createDataFrame(
                [], BATCH_TOPK_SCHEMA + ", rank int"
            )
        uniq_terms = list({t for _, t in q_terms})
        qt = self.spark.createDataFrame(q_terms, "qid string, term string")
        qt = qt.join(
            self.df_table.filter(
                F.col("term").isin(list({t for _, t in q_terms}))
            ),
            "term",
        ).withColumn(
            "idf",
            F.log1p((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        ).select("qid", "term", "idf")
        seg = self._pruned_segments(uniq_terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        joined = seg.join(F.broadcast(qt), "term")
        bound_scale = max(1.0, float(m["avgdl"]) / float(m["norm_avgdl"]))
        scorer = make_batch_slab_scorer(
            int(m["slab_size"]),
            int(m["block_size"]),
            k,
            float(m["k1"]),
            float(m["b"]),
            float(m["avgdl"]),
            bound_scale,
        )
        per = joined.groupBy("qid", "slab").applyInPandas(
            scorer, schema=BATCH_TOPK_SCHEMA
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
        return (
            per.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def search_with_meta(self, query: str, k: int = 10) -> DataFrame:
        """Top-k decorated with path/repo metadata + snippet (F11)."""
        topk = self.search(query, k)
        sub = F.substring("content", 1, 200)
        cut = F.regexp_extract(sub, r"^([\s\S]{100,199}) ", 1)
        snippet = F.when(F.length("content") <= 200, F.col("content")).otherwise(
            F.when(F.length(cut) > 0, F.concat(cut, F.lit("..."))).otherwise(
                F.concat(sub, F.lit("..."))
            )
        )
        return (
            topk.join(self.docmap, "docid")
            .select(
                "docid", "score", "repo", "path", "commit", "lang",
                snippet.alias("snippet"),
            )
            .orderBy(F.desc("score"), F.asc("docid"))
        )
