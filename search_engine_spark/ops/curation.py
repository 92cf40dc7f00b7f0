"""Corpus-curation operators for the LLM-training-data pipeline:

- ``dup_spans``       — cross-corpus duplicated n-gram span detection
  (substring-level dedup signal, Lee et al. 2021 "Deduplicating
  Training Data Makes Language Models Better"): for every n-gram
  position in every document, is that n-gram repeated anywhere in the
  corpus (including elsewhere in the same document)?
- ``decontaminate``   — benchmark-overlap flagging (GPT-3 appendix C
  style): mark training documents sharing any n-gram with a held-out
  evaluation set.
- ``gopher_quality``  — repetition/quality statistics per document
  (Rae et al. 2021 §A1.1): mean word length, top-bigram occupancy,
  and a keep/drop verdict.
- ``sample_stratified`` — deterministic hash-bucket sampling with
  per-group keep rates (domain/language mixing): reproducible across
  jobs and cluster sizes because the bucket is a pure function of the
  document id, never of partitioning or RNG state.

All four are pure JVM column math (no Python in any data path); every
hash is md5-based so the DuckDB oracles reproduce values bit-for-bit.

Scale notes (100 TB):
- dup_spans ships 8-byte md5-prefix hashes through its shuffles, not
  n-gram strings; the duplicated-gram set (count >= 2) is usually a
  small fraction of distinct grams, and AQE can broadcast it for the
  join-back.  No all-pairs stage anywhere.
- decontaminate broadcasts the evaluation gram set — benchmark
  suites are tiny by nature, so the training side is a single
  map-side semi-join pass with one per-doc aggregation.
- gopher_quality is per-document arithmetic plus one (docid, bigram)
  aggregation — partial-aggregated map-side before the shuffle.
- sample_stratified is a broadcast join against the rate table plus a
  filter; zero wide shuffles, and the hash bucket makes re-runs and
  incremental appends select the same documents.

Reference parity: the reference engine has no training-data pipeline
(it delegates search to ES and has no curation stage) — these extend
the brief's LLM-pipeline surface, sharing the frozen tokenizer with
the index path (tokenizer.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.ops.params import (
    CURATION_NGRAM_N,
    GOPHER_MWL_MAX,
    GOPHER_MWL_MIN,
    GOPHER_TOP_BIGRAM_MAX,
    SAMPLE_BUCKETS,
    SAMPLE_DEFAULT_RATE,
)


def _md5_60bit(col):
    """First 15 hex chars of md5 as a non-negative int64 — the
    engine-portable hash idiom shared with ops/minhash.py."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _grams(toks_col, n: int):
    """array<string> of space-joined token n-grams (empty when the
    document has fewer than n tokens — guarded because sequence()
    with start > stop counts DOWN in Spark)."""
    return F.when(
        F.size(toks_col) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - n),
            lambda i: F.array_join(F.slice(toks_col, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


# --- duplicated n-gram spans ------------------------------------------------

def dup_spans(docs_toks: DataFrame, n: int = CURATION_NGRAM_N) -> DataFrame:
    """(docid, toks) -> (docid, n_ngrams, n_dup, dup_frac).

    A position is duplicated when its n-gram (hashed to the md5-60bit
    key) occurs >= 2 times across the whole corpus — same-document
    repeats count, matching the substring-dedup view that any repeated
    span is redundant training signal.  Documents shorter than n
    tokens report (0, 0, 0.0).
    """
    pos = docs_toks.select(
        "docid", F.explode(_grams(F.col("toks"), n)).alias("gram")
    ).select("docid", _md5_60bit("gram").alias("h"))
    dup = (
        pos.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h", F.lit(True).alias("_dup"))
    )
    per = (
        pos.join(dup, "h", "left")
        .groupBy("docid")
        .agg(
            F.count("*").cast("long").alias("n_ngrams"),
            F.sum(F.when(F.col("_dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
    )
    return (
        docs_toks.select("docid")
        .join(per, "docid", "left")
        .select(
            "docid",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup"),
        )
        .withColumn(
            "dup_frac",
            F.when(
                F.col("n_ngrams") > 0, F.col("n_dup") / F.col("n_ngrams")
            ).otherwise(F.lit(0.0)),
        )
    )


# --- benchmark decontamination ----------------------------------------------

def decontaminate(
    corpus_toks: DataFrame, eval_toks: DataFrame, n: int = CURATION_NGRAM_N
) -> DataFrame:
    """(corpus docid, toks) x (eval docid, toks) ->
    (docid, n_hits, contaminated).

    ``n_hits`` counts corpus n-gram POSITIONS whose gram appears in
    the distinct evaluation gram set; ``contaminated`` is n_hits > 0.
    Every corpus document gets a row (zero hits included) so the
    output is a complete per-doc verdict, not a hit list.
    """
    ev = eval_toks.select(
        F.explode(_grams(F.col("toks"), n)).alias("gram")
    ).distinct()
    grams = corpus_toks.select(
        "docid", F.explode(_grams(F.col("toks"), n)).alias("gram")
    )
    hits = (
        grams.join(F.broadcast(ev), "gram")
        .groupBy("docid")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    return (
        corpus_toks.select("docid")
        .join(hits, "docid", "left")
        .select(
            "docid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


# --- Gopher-style repetition / quality stats --------------------------------

def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(docid, text) -> (docid, n_words, mean_word_len,
    top_bigram_frac, keep).

    Raw whitespace words (NOT the index tokenizer — repetition
    filters must see stopwords and short words, exactly the tokens
    the tokenizer deletes).  mean_word_len = sum(len)/n_words;
    top_bigram_frac = max bigram count / (n_words - 1); keep when
    mean_word_len is inside [GOPHER_MWL_MIN, GOPHER_MWL_MAX] and
    top_bigram_frac <= GOPHER_TOP_BIGRAM_MAX.  Both fractions are a
    single int64->double division, so the oracle matches bit-exactly.
    """
    words = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = (
        docs.select("docid", words.alias("words"))
        .withColumn("n_words", F.size("words").cast("long"))
        .withColumn(
            "sum_len",
            F.aggregate(
                F.transform("words", lambda w: F.length(w)),
                F.lit(0),
                lambda a, x: a + x,
            ).cast("long"),
        )
    )
    bigrams = F.when(
        F.col("n_words") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.col("n_words") - 2),
            lambda i: F.concat(
                F.element_at("words", (i + 1).cast("int")),
                F.lit(" "),
                F.element_at("words", (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top = (
        base.select("docid", F.explode(bigrams).alias("bg"))
        .groupBy("docid", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("docid")
        .agg(F.max("c").cast("long").alias("top_c"))
    )
    out = (
        base.join(top, "docid", "left")
        .select(
            "docid",
            "n_words",
            F.when(
                F.col("n_words") > 0, F.col("sum_len") / F.col("n_words")
            )
            .otherwise(F.lit(0.0))
            .alias("mean_word_len"),
            F.when(
                F.col("n_words") > 1,
                F.coalesce("top_c", F.lit(0)) / (F.col("n_words") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("mean_word_len") >= GOPHER_MWL_MIN)
            & (F.col("mean_word_len") <= GOPHER_MWL_MAX)
            & (F.col("top_bigram_frac") <= GOPHER_TOP_BIGRAM_MAX),
        )
    )
    return out


# --- deterministic stratified sampling --------------------------------------

def sample_stratified(
    docs: DataFrame,
    rates: dict[str, int],
    id_col: str = "docid",
    group_col: str = "lang",
    default_rate: int = SAMPLE_DEFAULT_RATE,
) -> DataFrame:
    """Keep a row iff md5-60bit(str(id)) % SAMPLE_BUCKETS is below the
    group's per-mille rate.  Returns (id, group, bucket) for kept
    rows.  The bucket is a pure function of the id — the same
    document is kept or dropped regardless of partitioning, cluster
    size, or re-runs, which is what makes incremental appends and
    resumed jobs sample consistently.
    """
    spark = docs.sparkSession
    rates_df = spark.createDataFrame(
        sorted(rates.items()), f"{group_col} string, rate int"
    )
    bucket = (
        _md5_60bit(F.col(id_col).cast("string")) % SAMPLE_BUCKETS
    ).cast("long")
    return (
        docs.withColumn("bucket", bucket)
        .join(F.broadcast(rates_df), group_col, "left")
        .filter(
            F.col("bucket")
            < F.coalesce("rate", F.lit(int(default_rate)))
        )
        .select(id_col, group_col, "bucket")
    )


def dup_span_ranges(
    docs_toks: DataFrame, n: int = CURATION_NGRAM_N
) -> DataFrame:
    """(docid, toks) -> maximal duplicated spans
    (docid, span_start, span_tokens, n_positions).

    Consecutive duplicated n-gram positions (as defined by
    ``dup_spans``) merge into islands via the gaps-and-islands
    row_number trick; a span starting at token position s with last
    duplicated gram position e covers e - s + n tokens — the piece a
    substring-level dedup pass would actually cut (Lee et al. 2021
    remove the repeated span, not the whole document).

    Scale: the only window runs per-document over that document's
    duplicated positions (bounded by doclen), partitioned by docid —
    no global ordering anywhere.
    """
    from pyspark.sql import Window

    pos = docs_toks.select(
        "docid", F.posexplode(_grams(F.col("toks"), n)).alias("pos", "gram")
    ).select("docid", "pos", _md5_60bit("gram").alias("h"))
    dup = (
        pos.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    dpos = pos.join(dup, "h").select("docid", "pos")
    w = Window.partitionBy("docid").orderBy("pos")
    isl = dpos.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    return (
        isl.groupBy("docid", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") - F.min("pos") + n).cast("long").alias(
                "span_tokens"
            ),
            F.count("*").cast("long").alias("n_positions"),
        )
        .select("docid", "span_start", "span_tokens", "n_positions")
    )


def lm_score(docs_toks: DataFrame) -> DataFrame:
    """Unigram-LM cross-entropy quality score (the CCNet-style signal
    — Wenzek et al. 2020 score with a KenLM 5-gram; the unigram model
    is the honest offline-container analog, and the operator shape is
    what matters at scale: a corpus-wide probability table joined back
    to the token stream, never a Python loop).

    (docid, toks) -> (docid, n_toks, xent, ppl) where
    p(t) = tf_corpus(t) / total_tokens,
    xent = -mean ln p(t) over the doc's tokens (rounded to 6 dp),
    ppl  = exp(xent) (rounded to 4 dp).
    Zero-token documents report (0, 0.0, 1.0).

    Scale: the vocab table is |V| rows (tiny next to the corpus) —
    AQE broadcasts it; the per-doc aggregation partial-aggregates
    map-side.  Rounding on both engines absorbs the sub-1e-12 ulp
    drift of ln/exp and float summation order, the same contract the
    BM25 and freshness oracles use.
    """
    ex = docs_toks.select("docid", F.explode("toks").alias("term"))
    vocab = ex.groupBy("term").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("total"))
    logp = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.log(F.col("tf").cast("double") / F.col("total").cast("double"))
        .alias("logp"),
    )
    per = (
        ex.join(logp, "term")
        .groupBy("docid")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            (-F.sum("logp") / F.count("*")).alias("xent_raw"),
        )
    )
    return (
        docs_toks.select("docid")
        .join(per, "docid", "left")
        .select(
            "docid",
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
            F.round(F.coalesce("xent_raw", F.lit(0.0)), 6).alias("xent"),
            F.round(F.exp(F.coalesce("xent_raw", F.lit(0.0))), 4).alias(
                "ppl"
            ),
        )
    )
