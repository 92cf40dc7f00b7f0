"""Deterministic synthetic source-code corpus (FIXTURES.md §2).

Counter-based generation: every column of doc *i* is a pure function
of ``(seed, i)`` via splitmix64, so the same corpus materializes
identically whether generated on the driver (small, for the oracle)
or distributed via ``spark.range(n).mapInPandas`` (bench scale) —
partitioning cannot perturb content.

Spec highlights (FIXTURES.md):
- ~2000 code-like identifiers (camelCase + snake_case) + the
  reference's synonym-map vocabulary (QueryExpansionService.java:17-30),
- Zipf(s=1.1) term distribution (hot head, df=1 tail),
- lognormal doc length, median ~120 tokens, clipped [20, 4000],
- 5% exact duplicates (same content, different repo/path),
- Zipf-skewed repo sizes (hot repo ~20% of files).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42

_STEMS = (
    "get set parse build merge index query score token hash crawl rank page "
    "link doc term search cache retry batch shard split read write flush seek "
    "scan filter join sort"
).split()

_SNAKE_SUFFIXES = ["er", "ing", "_id", "_count", "_map", "_list"]
_CAMEL_SUFFIXES = ["Buffer", "Handler", "Service", "Impl", "Util", "Config"]

# Reference synonym-map keys, verbatim (QueryExpansionService.java:17-30),
# spliced across Zipf ranks so reference-derived queries hit head,
# mid, and tail terms.
_REF_VOCAB = [
    "java", "python", "javascript", "search", "database",
    "algorithm", "tutorial", "api", "framework", "bug",
]

_LANGS = ["python", "java", "go", "js", "rust", "md"]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js",
        "rust": "rs", "md": "md"}


def build_vocab(size: int = 2000) -> list[str]:
    """Deterministic identifier vocabulary (order defines Zipf rank)."""
    words: list[str] = []
    for st in _STEMS:
        for suf in _SNAKE_SUFFIXES:
            words.append(st + suf)
        for suf in _CAMEL_SUFFIXES:
            words.append(st + suf)
        for d in range(10):
            words.append(f"{st}{d}")
    # camelCase pairs: parseToken, buildIndex, ...
    for i, a in enumerate(_STEMS):
        for b in _STEMS[i + 1:]:
            words.append(a + b.capitalize())
            if len(words) >= size + 200:
                break
        if len(words) >= size + 200:
            break
    # de-dup preserving order, truncate, then splice reference vocab
    seen: set[str] = set()
    uniq = [w for w in words if not (w in seen or seen.add(w))]
    uniq = [w for w in uniq if w not in _REF_VOCAB][: size - len(_REF_VOCAB)]
    out = list(uniq)
    # positions: head, then spread through the ranks
    positions = [1, 7, 23, 61, 140, 310, 620, 990, 1400, len(out)]
    for w, p in zip(_REF_VOCAB, positions):
        out.insert(min(p, len(out)), w)
    return out[:size]


VOCAB = build_vocab()
_ZIPF_S = 1.1


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w) / w.sum()


_VOCAB_CDF = _zipf_cdf(len(VOCAB), _ZIPF_S)

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 (public-domain constant set)."""
    x = x.astype(_U64)
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _U64(0xFFFFFFFFFFFFFFFF)
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _U64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> _U64(31))


def _uniform(i: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """U(0,1) for counter `i` on stream `stream` — pure function."""
    h = _splitmix64(
        i.astype(_U64) * _U64(0x100000001B3)
        + _U64(stream * 1315423911 + seed * 2654435761)
    )
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


def _doc_lengths(idx: np.ndarray, seed: int) -> np.ndarray:
    # Irwin-Hall(12) approximate normal -> lognormal, median 120.
    z = np.zeros(len(idx), dtype=np.float64)
    for k in range(12):
        z += _uniform(idx, 100 + k, seed)
    z -= 6.0  # ~N(0,1)
    ln = np.exp(np.log(120.0) + 0.6 * z)
    return np.clip(ln, 20, 4000).astype(np.int64)


def _source_index(idx: np.ndarray, seed: int) -> np.ndarray:
    """5% of docs (i>=20) replicate an earlier doc's content exactly."""
    u = _uniform(idx, 7, seed)
    dup = (u < 0.05) & (idx >= 20)
    j = (_splitmix64(idx.astype(_U64) + _U64(seed * 77)) % np.maximum(
        idx.astype(_U64) // _U64(2), _U64(1))).astype(np.int64)
    src = np.where(dup, j, idx)
    # a dup's source must itself be canonical to keep chains short
    u2 = _uniform(src, 7, seed)
    dup2 = (u2 < 0.05) & (src >= 20)
    j2 = (_splitmix64(src.astype(_U64) + _U64(seed * 77)) % np.maximum(
        src.astype(_U64) // _U64(2), _U64(1))).astype(np.int64)
    return np.where(dup2, j2, src)


def _render_content(i: int, seed: int) -> str:
    """Content of canonical doc i: fake code over Zipf-sampled tokens."""
    n = int(_doc_lengths(np.array([i]), seed)[0])
    u = _uniform(np.arange(n, dtype=np.int64) + np.int64(i) * np.int64(1 << 20), 3, seed)
    toks = [VOCAB[k] for k in np.searchsorted(_VOCAB_CDF, u)]
    lines = []
    p = 0
    li = 0
    while p < n:
        m = 3 + ((i + li) % 5)
        chunk = toks[p:p + m]
        p += m
        k = (i + li) % 4
        if k == 0 and len(chunk) >= 2:
            lines.append(f"def {chunk[0]}({', '.join(chunk[1:])}):")
        elif k == 1 and len(chunk) >= 3:
            lines.append(f"    {chunk[0]} = {chunk[1]}.{chunk[2]}({' ,'.join(chunk[3:])})")
        elif k == 2:
            lines.append("    return " + " + ".join(chunk))
        else:
            lines.append("    # " + " ".join(chunk))
        li += 1
    if i % 97 == 0:
        # df=1 tail anchors: exercise max-skew query pairs and WAND skips
        lines.append(f"    # anchor uniq{i}token")
    return "\n".join(lines)


def _repo_of(idx: np.ndarray, n_docs: int, seed: int) -> np.ndarray:
    n_repos = max(3, n_docs // 200)
    cdf = _zipf_cdf(n_repos, 1.2)
    u = _uniform(idx, 11, seed)
    return np.searchsorted(cdf, u)


def gen_batch(idx: np.ndarray, n_docs: int, seed: int = SEED) -> pd.DataFrame:
    """Generate documents for arbitrary indices (partition-independent)."""
    idx = np.asarray(idx, dtype=np.int64)
    src = _source_index(idx, seed)
    repo_idx = _repo_of(idx, n_docs, seed)
    lang_idx = (_splitmix64(idx.astype(_U64) + _U64(5)) % _U64(len(_LANGS))).astype(int)
    langs = [_LANGS[k] for k in lang_idx]
    repos = [f"org/repo-{r:04d}" for r in repo_idx]
    paths = [
        f"src/m{int(i) % 37:02d}/{VOCAB[int(_splitmix64(np.array([i + 13])).item() % len(VOCAB))]}_{int(i)}.{_EXT[lg]}"
        for i, lg in zip(idx, langs)
    ]
    contents = [_render_content(int(j), seed) for j in src]
    commits = [
        f"{int(_splitmix64(np.array([i * 31 + 1])).item()):016x}{int(_splitmix64(np.array([i * 31 + 2])).item()):016x}{int(_splitmix64(np.array([i * 31 + 3])).item()) & 0xFFFFFFFF:08x}"
        for i in idx
    ]
    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def corpus_pandas(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    return gen_batch(np.arange(n_docs), n_docs, seed)


DOCUMENT_SCHEMA = "repo string, path string, commit string, lang string, content string"


def corpus_df(spark, n_docs: int, seed: int = SEED, partitions: int | None = None):
    """Distributed generation: identical content to ``corpus_pandas``."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(iterator):
        for pdf in iterator:
            yield gen_batch(pdf["id"].to_numpy(), n_docs, seed)

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=DOCUMENT_SCHEMA)
    )


def write_corpus(spark, n_docs: int, out_dir: str, seed: int = SEED) -> None:
    corpus_df(spark, n_docs, seed).write.mode("overwrite").parquet(out_dir)
