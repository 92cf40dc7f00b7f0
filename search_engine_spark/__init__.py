"""search_engine_spark — a PySpark-native full-text index + BM25 engine.

A from-scratch rebuild of the query/data-processing semantics of the
reference web search engine (``BaoTo12/search-engine``, a Java/Spring
crawler + Elasticsearch indexer) as pure batch DataFrame transforms:

- code-aware tokenization (shared between build, query, and oracle),
- sha-256 exact dedup with deterministic docid assignment,
- inverted-index segments (docid-delta + varint postings, aligned
  128-doc block-max skip metadata) built with ``applyInPandas``,
- LSM-style per-slab segment merge,
- BM25 (k1=1.2, b=0.75) top-k with block-max pruning, executed
  per-slab (shard) with a global top-k merge — the Spark-native
  equivalent of ES's per-shard query + coordinating-node merge,
- per-slab lineage checkpointing so builds resume mid-job,
- plus training-data pipeline operators (dedup family, similarity
  search, text analysis, multimodal plumbing) under ``ops/``.

Blueprint: SURVEY.md at the repo root. Everything here derives from
public knowledge (Apache Spark APIs, the public reference repo, and
published IR literature: Robertson/Zaragoza BM25; Broder et al.
block-max WAND).
"""

from search_engine_spark.config import EngineConfig

__all__ = ["EngineConfig"]
