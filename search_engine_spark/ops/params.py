"""Shared constants for the training-data pipeline operators.

Single source of truth for every seed/prime/threshold used by BOTH
the Spark implementations and the generated DuckDB oracle SQL —
numeric drift between the two sides would break the driver's
value-hash comparison.
"""

from __future__ import annotations

# --- SimHash (reference SimHashService.java:23,28-61) ---
SIMHASH_BITS = 64
SIMHASH_HAMMING_THRESHOLD = 3     # SimHashService.java:23
SIMHASH_BANDS = 4                 # docs/advanced-deep-dive.md:349-390
SIMHASH_BAND_BITS = 16

# --- MinHash / LSH ---
MINHASH_K = 16                    # signature length
MINHASH_BANDS = 4                 # 4 bands x 4 rows
MINHASH_ROWS = 4
MINHASH_PRIME = 1_000_000_007     # int32 prime; keeps products < 2^63
SHINGLE_N = 3
# Deterministic affine hash params a_i, b_i (generated once, frozen).
# a_i odd, in [1, 2^30); b_i in [0, 2^30).
MINHASH_A = [
    754974721, 377487361, 188743681, 94371841, 47185921, 23592961,
    11796481, 5898241, 2949121, 1474561, 737281, 368641, 184321,
    92161, 46081, 23041,
]
MINHASH_B = [
    99991, 199933, 299993, 399989, 499979, 599999, 699967, 799999,
    899981, 999983, 1099997, 1199999, 1299989, 1399999, 1499993,
    1599989,
]

# --- n-gram Jaccard near-dup ---
JACCARD_THRESHOLD = 0.5

# --- Embedding similarity ---
ANN_SIGN_DIMS = 8                 # sign-LSH bucket over first 8 dims
IVF_CENTROIDS = 16                # vec_id 0..15 act as coarse centroids
IVF_PROBES = 2
COSINE_DUP_THRESHOLD = 0.95
# Doc-derived embedding near-dup: token-hash count vectors (md5 -> one
# of DOC_EMBED_DIMS dims, summed tf), candidates from MinHash LSH,
# exact cosine verification on candidates only.
DOC_EMBED_DIMS = 64
DOC_COSINE_DUP_THRESHOLD = 0.9

# --- Random-hyperplane sign-LSH ANN (seeded, shared with the SQL
# oracle as literals; see similarity.lsh_planes) ---
ANN_LSH_TABLES = 24
ANN_LSH_BITS = 4
ANN_LSH_SEED = 42

# --- IVF (k-means trained) ---
IVF_KMEANS_K = 16
IVF_KMEANS_ITERS = 5
# The sf embeddings' nearest neighbors are near-orthogonal (top-10
# cosines ~0.45-0.51), so high probe counts are needed for the 0.9
# recall gate; clustered real-world embeddings need far fewer.
IVF_TRAINED_PROBES = 8

# --- Text stats ---
# Marker words for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "with", "for", "this", "that", "from"),
    "de": ("der", "die", "das", "und", "mit", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "des", "est", "pas", "une"),
    "es": ("el", "los", "las", "que", "con", "por", "para", "una"),
}
FP_PRIME = 1_000_000_007          # fingerprint modulus

# --- PageRank (PageRankCalculator.java:16-18) ---
PAGERANK_D = 0.85
PAGERANK_ITERS = 5                # unrolled in the SQL oracle

# --- Corpus curation (ops/curation.py) ---
# n-gram size shared by the duplicated-span detector and the
# decontamination overlap check.  3 is the demonstration size for the
# synthetic corpora (its ~30-word vocabulary makes trigram collisions
# common at every sf); real pipelines use 8-13 token grams (Lee et
# al. 2021; GPT-3 used 13-gram decontamination) — the operators take
# n as a parameter, only the contract pins 3.
CURATION_NGRAM_N = 3
# Contract split for decontaminate: docid % DECON_EVAL_MOD == 0 plays
# the held-out benchmark set, everything else is the training corpus.
DECON_EVAL_MOD = 97
# Gopher-style repetition/quality thresholds (Rae et al. 2021 §A1.1
# uses mean word length in [3, 10]; the top-2-gram character fraction
# bound there is 0.20 — 0.08 here because the synthetic corpus' tiny
# vocabulary concentrates bigram mass far above real text).
GOPHER_MWL_MIN = 3.0
GOPHER_MWL_MAX = 10.0
GOPHER_TOP_BIGRAM_MAX = 0.08
# Deterministic stratified sampling: md5-60bit(docid) % SAMPLE_BUCKETS
# compared against a per-group keep rate (per-mille).  The contract
# rates downsample the dominant language and keep the rarest whole.
SAMPLE_BUCKETS = 1000
SAMPLE_RATES: dict[str, int] = {
    "en": 250, "de": 500, "es": 500, "fr": 500, "zh": 1000,
}
SAMPLE_DEFAULT_RATE = 500
