"""Token-window document chunking for training-data pipelines.

Every large-scale LLM data pipeline splits documents into
token-budgeted windows with overlap before packing/training; this is
that operator over the engine's frozen tokenizer semantics
(tokenizer.tokens_col — the same list every other operator and the
DuckDB oracle compute).

Shape: for a document with n tokens and window ``max_tokens`` /
``overlap``, windows start at 0, stride, 2*stride, ... (< n) where
``stride = max_tokens - overlap``; each chunk is the (clamped) slice
of ``max_tokens`` tokens from its start.  Every token of the
document appears in at least one chunk; consecutive chunks share
exactly ``overlap`` tokens (except a shorter final chunk); a
document with zero tokens yields zero chunks.

Scale: pure JVM column functions — ``sequence`` for window starts,
``posexplode`` for the fan-out, ``slice`` + ``array_join`` for the
window — wholly inside whole-stage codegen, with NO shuffle (the
fan-out is row-local, output partitioning follows input
partitioning, and no key skew is possible).  Memory is bounded by
one document's token array per row.  This is the 100 TB-safe shape:
a corpus-wide chunking pass is a single map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    docs: DataFrame,
    *,
    max_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "docid",
    toks_col: str = "toks",
) -> DataFrame:
    """(id, toks array) -> one row per chunk: (id, chunk_id,
    n_tokens, chunk) where ``chunk`` is the window's tokens joined
    with single spaces (the tokenized form — the frozen tokenizer
    already dropped punctuation and case)."""
    if not isinstance(max_tokens, int) or max_tokens <= 0:
        raise ValueError(f"max_tokens must be a positive int, got "
                         f"{max_tokens!r}")
    if not isinstance(overlap, int) or not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens, got "
            f"overlap={overlap!r} max_tokens={max_tokens}"
        )
    stride = max_tokens - overlap
    n = F.size(toks_col)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col),
        F.col(toks_col),
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    window = F.slice(F.col(toks_col), F.col("start") + 1, max_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(window).cast("int").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk"),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    max_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "docid",
    text_col: str = "content",
) -> DataFrame:
    """Tokenize ``text_col`` with the engine's frozen tokenizer and
    window the result — the one-call form for raw corpora."""
    from search_engine_spark.tokenizer import tokens_col

    toks = docs.select(
        F.col(id_col), tokens_col(text_col).alias("toks")
    )
    return chunk_tokens(
        toks, max_tokens=max_tokens, overlap=overlap, id_col=id_col
    )
