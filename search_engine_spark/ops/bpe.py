"""Distributed BPE tokenizer training (byte-pair encoding).

The classic subword-vocabulary learner of LLM training pipelines
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016 — the public algorithm GPT-2/RoBERTa
tokenizers build on): start from characters, repeatedly merge the
most frequent adjacent symbol pair, weighted by word frequency.

Distributed shape (the 100 TB story):

- ONE corpus pass builds the word-frequency table (explode tokens ->
  groupBy word).  Everything after operates on the vocabulary table —
  orders of magnitude smaller than the corpus (distinct words), the
  same reduction every practical BPE trainer exploits.
- Each merge round is two small jobs over that table: adjacent-pair
  counts (posexplode -> groupBy pair, integer sum — map-side partial
  aggregation) and a TakeOrdered-1 argmax; then a pure column
  transform applies the merge.  No driver-side word loop ever exists.
- Determinism: integer counts, (count desc, pair asc) tie-break, and
  a merge application that is a pure function of the previous table —
  the learned merge list is identical across partitionings and
  cluster sizes (pinned in tests).

Representation: a word is a DOUBLE-SPACE-joined symbol string ending
in the ``</w>`` end-of-word marker ("hello" -> "h  e  l  l  o  </w>").
Merging pair (a, b) is the literal replace of " a  b " with " ab " on
the single-space-padded string.  The doubled boundary is what makes a
flat leftmost-nonoverlapping replace EXACTLY the reference
algorithm's left-to-right symbol walk (merge at i, continue at i+2):
each match consumes one space from its left and right boundaries and
the replacement restores them, so an immediately-following occurrence
still has its delimiter and matches in the same pass.  With
single-space joining, consecutive overlapping occurrences share one
delimiter char and the replace skips every second one — "a a a a a"
under merge (a,a) becomes "aa a aa" instead of the walk's "aa aa a"
(a real divergence a review caught; the double-space form is the
fix, pinned in tests against an independent index-walk reference).
Spark's ``replace``, DuckDB's ``replace`` and Python's
``str.replace`` share these semantics, which is what lets the DuckDB
contract twin compare hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.tokenizer import tokens_col

END_WORD = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "content") -> DataFrame:
    """(word, freq) over the frozen tokenizer's tokens — the one
    corpus-sized pass; every merge round after runs on this table."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


SEP = "  "  # the double-space symbol boundary (see module docstring)


def _sym_col(word_col):
    """word -> double-spaced symbol string:
    "hello" -> "h  e  l  l  o  </w>"."""
    chars = F.filter(F.split(word_col, ""), lambda x: F.length(x) > 0)
    return F.concat(F.concat_ws(SEP, chars), F.lit(SEP + END_WORD))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent symbol pairs weighted by word freq."""
    arr = F.split(F.col("sym"), SEP)
    # guard the fully-merged single-symbol case: Spark's sequence(0,
    # -1) DESCENDS ([0, -1]) instead of being empty, and element_at
    # would then index out of bounds
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - 2),
            lambda i: F.concat(
                F.element_at(arr, i + 1),
                F.lit(" "),
                F.element_at(arr, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(sym_col, a: str, b: str):
    """One merge round: the reference algorithm's left-to-right walk,
    as ONE literal replace on the single-space-padded double-space
    representation (each match consumes one boundary space per side;
    the replacement restores them, so back-to-back occurrences merge
    in the same pass — see module docstring)."""
    padded = F.concat(F.lit(" "), sym_col, F.lit(" "))
    replaced = F.replace(
        padded, F.lit(f" {a}{SEP}{b} "), F.lit(f" {a}{b} ")
    )
    return F.trim(replaced)


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "content",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a document corpus.

    Returns (merges, words): merges = [(left, right, pair_count),
    ...] in learned rank order; words = the final (word, freq, sym)
    table with all merges applied.  Stops early if no adjacent pair
    remains (fully merged vocabulary).

    Each round persists its table, materializes it (so the argmax and
    the next round read the SAME computed state, never a replayed
    lineage — the pagerank loop discipline), and unpersists its
    predecessor.
    """
    words = (
        word_freqs(docs, text_col)
        .withColumn("sym", _sym_col(F.col("word")))
        .persist()
    )
    words.count()
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        a, b = pair.split(" ")
        merges.append((a, b, cnt))
        nxt = words.withColumn(
            "sym", _apply_merge(F.col("sym"), a, b)
        ).persist()
        nxt.count()
        words.unpersist()
        words = nxt
    return merges, words


def bpe_encode_col(word_col, merges: list[tuple]):
    """Spark Column: encode a word column with a learned merge list —
    the merges replay in rank order over the same spaced
    representation (the standard BPE encoder for short merge lists;
    expression depth grows with len(merges), so cap around a few
    hundred or encode via the words table join).  Returns the symbol
    array."""
    sym = _sym_col(word_col)
    for a, b, *_ in merges:
        sym = _apply_merge(sym, a, b)
    return F.split(sym, SEP)


def bpe_encode_join(
    df: DataFrame,
    words: DataFrame,
    merges: list[tuple],
    word_col: str = "word",
) -> DataFrame:
    """The at-scale encoder: adds a ``syms`` array column to ``df`` by
    EQUI-JOINING against the trained words table (bpe_train's second
    return — every trained word already carries its fully-merged
    symbol string), falling back to the merge-replay expression only
    for out-of-vocabulary words.  One broadcast/shuffle join instead
    of len(merges) chained replaces per row — at 100 TB the corpus
    re-encode touches the vocabulary table once, and the replay
    expression (whose plan depth grows with the merge count) only
    ever evaluates on the OOV minority (coalesce short-circuits per
    row)."""
    w = words.select(
        F.col("word").alias(word_col),
        F.split(F.col("sym"), SEP).alias("_trained"),
    )
    joined = df.join(w, word_col, "left")
    return joined.withColumn(
        "syms",
        F.coalesce(
            F.col("_trained"), bpe_encode_col(F.col(word_col), merges)
        ),
    ).drop("_trained")


def merges_df(spark: SparkSession, merges: list[tuple]) -> DataFrame:
    """(rank, left, right, cnt) DataFrame of a learned merge list."""
    return spark.createDataFrame(
        [
            (i + 1, a, b, int(c))
            for i, (a, b, c) in enumerate(merges)
        ],
        "rank int, left string, right string, cnt long",
    )


def _walk_merge(parts: list[str], a: str, b: str) -> list[str]:
    """The canonical BPE merge: scan left to right, merge at i,
    continue at i+2.  The independent semantics reference the string
    replaces are pinned against."""
    out: list[str] = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def py_bpe_reference(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Driver-free reference implementation (the ACL'16 pseudocode)
    used by the parity tests — an explicit symbol-list index walk,
    deliberately NOT the string-replace trick the Spark/DuckDB twins
    use, so parity genuinely gates the merge semantics."""
    from collections import Counter

    words: dict[tuple, int] = {
        tuple(list(w) + [END_WORD]): f for w, f in word_freq.items()
    }
    out: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for sym, f in words.items():
            for i in range(len(sym) - 1):
                counts[sym[i] + " " + sym[i + 1]] += f
        if not counts:
            break
        # (count desc, pair-string asc) — the same total order the
        # Spark argmax and the DuckDB twin use
        pair, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ")
        out.append((a, b, c))
        nxt: dict[tuple, int] = {}
        for sym, f in words.items():
            merged = tuple(_walk_merge(list(sym), a, b))
            nxt[merged] = nxt.get(merged, 0) + f
        words = nxt
    return out
