"""Engine-wide constants and configuration.

BM25 parameters k1=1.2, b=0.75 match the reference's operative scorer
(Lucene/ES default BM25; see SURVEY.md §4 and the reference's intended
query at docs/features/query-expansion-nlp.md:246-300).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- BM25 (Lucene >= 8 / ES default; reference's operative scorer) ---
BM25_K1 = 1.2
BM25_B = 0.75

# --- Tokenizer (engine-defined, frozen; shared by build/query/oracle) ---
# Length filter: keep 2 < len < 50, mirroring the reference analyzer
# (SE/domain/indexing/service/TextProcessingService.java:42,83).
MIN_TOKEN_LEN_EXCL = 2
MAX_TOKEN_LEN_EXCL = 50
MAX_QUERY_LEN = 500  # SearchQuery.java:14-31 rejects > 500 chars

# Classic Lucene/ES English stop set (public; EnglishAnalyzer default).
# The reference indexes content with the english analyzer
# (WebPageEsDocument.java:37-38), which removes these.  We keep the
# stop set but — deliberately — no Porter stemming: the corpus is
# source code, and stemming identifiers harms retrieval.  This is the
# engine's defined semantics, documented in README.
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)

# --- Field-weighted search (the reference's intended query:
# docs/features/query-expansion-nlp.md:260-275 — multi_match with
# title^3.0 / content^1.0, synonym clauses at title^2.0 / content^0.8,
# summed across should clauses) ---
# Title terms share the segment store under a prefix namespace; '#'
# can never appear in tokenizer output ([a-z0-9]+), so no collision.
TITLE_PREFIX = "t#"
# Metadata keyword terms (`m#<field>=<value>`, one posting per doc per
# field) — the ES bool.filter / keyword-field namespace: filters push
# down INTO the index (term + bucket + slab pruning all apply) instead
# of post-filtering scored results.
META_PREFIX = "m#"
TITLE_BOOST = 3.0
CONTENT_BOOST = 1.0
TITLE_SYNONYM_BOOST = 2.0
CONTENT_SYNONYM_BOOST = 0.8

# --- Index layout ---
# Docids are partitioned into fixed-size "slabs" (shards).  A slab is
# the unit of: segment build parallelism, lineage/resume, and query
# fan-out.  Hot-term posting lists are split across slabs by
# construction, which is the salted-repartition skew defense the north
# rule asks for (salt == docid-range slab; cf. SURVEY.md §4 "salt hot
# terms" and §7 step 3).
DEFAULT_SLAB_SIZE = 1 << 18  # 262144 docs per slab (tunable per build)

# compact="auto" policy (indexer/build.py): splice-merge while
# avgdl / norm_avgdl stays within this factor; re-encode past it to
# re-tighten block-max WAND bounds.
AUTO_REENCODE_DRIFT = 1.25
DEFAULT_TERM_BUCKETS = 32    # hash buckets inside a slab for build parallelism
BLOCK_SIZE = 128             # docs per block for block-max skip metadata


@dataclass(frozen=True)
class EngineConfig:
    """Build/query configuration for one index."""

    slab_size: int = DEFAULT_SLAB_SIZE
    term_buckets: int = DEFAULT_TERM_BUCKETS
    block_size: int = BLOCK_SIZE
    k1: float = BM25_K1
    b: float = BM25_B
    # Parallelism hint used for repartitions during the build.
    build_partitions: int = 32
    # Index the title field (path basename tokens) under TITLE_PREFIX
    # for field-weighted (title^3/content^1) search.
    index_title: bool = True
    # Docmap columns indexed as `m#field=value` keyword terms for
    # bool.filter pushdown (one posting per doc per field — negligible
    # build cost).  Empty tuple disables the namespace.
    index_fields: tuple = ("lang", "repo")
    extra: dict = field(default_factory=dict)
