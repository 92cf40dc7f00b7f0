"""SearchEngine facade: build once, query many.

The query path is the Spark-native analog of the reference's intended
search lifecycle (SURVEY.md §3.1): query string -> shared tokenizer ->
segment scan pruned to query terms (partition/file pruning on the
term-bucketed, slab-partitioned segments table) -> per-slab block-max
WAND inside applyInPandas -> global TakeOrdered merge -> docmap join
for metadata/snippets.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import EngineConfig
from search_engine_spark.indexer.build import build_index
from search_engine_spark.query.wand import TOPK_SCHEMA, make_slab_scorer
from search_engine_spark.tokenizer import tokenize_query


def pack_admission_rows(adm: DataFrame, slab_size: int, gi: int) -> DataFrame:
    """(docid) admissible-doc DataFrame -> doc-values admission rows
    in segment-row shape: (slab, RAW_INC_TERM, raw sorted int64
    slab-local docids as bytes, NULL skips/block_max/idf, inc=gi) —
    one row per slab holding at least one admissible doc.  Consumed by
    make_slab_scorer exactly like a keyword bool.filter group."""
    import numpy as np
    import pandas as pd

    from search_engine_spark.query.wand import RAW_INC_TERM

    grouped = adm.select(
        F.floor(F.col("docid") / F.lit(slab_size)).cast("int").alias("slab"),
        F.col("docid").cast("long").alias("docid"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        local = np.sort(
            pdf["docid"].to_numpy(np.int64) % np.int64(slab_size)
        )
        return pd.DataFrame(
            {
                "slab": [int(pdf["slab"].iloc[0])],
                "postings": [local.tobytes()],
            }
        )

    packed = grouped.groupBy("slab").applyInPandas(
        pack, schema="slab int, postings binary"
    )
    return packed.select(
        F.col("slab"),
        F.lit(RAW_INC_TERM).alias("term"),
        F.col("postings"),
        F.lit(None).cast("binary").alias("skips"),
        F.lit(None).cast("binary").alias("block_max"),
        F.lit(None).cast("double").alias("idf"),
        F.lit(int(gi)).cast("int").alias("inc"),
    )


def _msm_count(msm, n: int) -> int:
    """ES minimum_should_match value -> required distinct-term count.

    The full ES grammar subset: a positive int passes through; a
    NEGATIVE int means "total minus that many may be missing" (n+m);
    "P%" takes floor(n*P/100); "-P%" means n minus floor(n*P/100) —
    percentages round DOWN before use, the documented ES rule.  The
    result clamps at 0, and m <= 1 normalizes to 0: every scored doc
    matches at least one clause, so msm=1 IS plain OR — returning 0
    keeps the serving fused fast path and the count-free kernels."""
    if msm is None:
        return 0
    if isinstance(msm, str):
        s = msm.strip()
        if not s.endswith("%"):
            raise ValueError(f"minimum_should_match {msm!r}: int or 'P%'")
        p = int(s[:-1])
        m = (n * p) // 100 if p >= 0 else n - ((n * -p) // 100)
    else:
        m = int(msm)
        if m < 0:
            m = n + m
    return 0 if m <= 1 else m


def _dto_ranges(date_from, date_to, min_quality):
    """SearchRequestDTO range params -> [(field, lo, hi)] doc-values
    ranges (None when nothing is constrained).  Dates accept ISO
    strings or day offsets (ops/ranking.day_offset)."""
    from search_engine_spark.ops.ranking import day_offset

    ranges: list[tuple[str, float | None, float | None]] = []
    if min_quality is not None:
        ranges.append(("quality", float(min_quality), None))
    if date_from is not None or date_to is not None:
        ranges.append(
            (
                "day",
                float(day_offset(date_from)) if date_from is not None else None,
                float(day_offset(date_to)) if date_to is not None else None,
            )
        )
    return ranges or None


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = True):
        self.spark = spark
        self.index_dir = index_dir
        self._cache_plans = cache
        # serving tier: max term-buckets held decoded in driver memory
        # (a serving head pins its shard hot, like ES's page cache); 0
        # switches the search_local* family to per-query pruned scans
        # (bounded memory, pays ~1 file-open per matching fragment).
        # serving_cache_max_bytes bounds the same cache in BYTES
        # (arrow-buffer size of each bucket's fragment table) so a
        # large index can't pin half its postings in driver memory
        # just because it fits in 16 buckets — eviction fires on
        # whichever bound (bucket count / byte budget) trips first.
        self.serving_cache_buckets = 16
        self.serving_cache_max_bytes = 1 << 30
        # decoded-postings cache (r5): terms served while the bucket
        # cache is on also keep their chunks' DECODED arrays (the
        # TermChunk._full memo) on a per-term LRU, so a warm term pays
        # zero varint work — the serving-head analog of Lucene leaning
        # on the OS page cache plus its own per-segment term caches.
        # Budget is exact (sum of memo array nbytes); 0 disables.
        # Eviction drops the arrays only — the encoded rows stay in
        # the bucket cache, so a re-miss costs one full decode, not IO.
        self.serving_decoded_max_bytes = 2 << 30
        # per-query slab fan-out for the no-Spark serving paths.
        # MEASURED NEGATIVE RESULT (r5, 1.09M docs): slabs are
        # independent, but the WAND kernel is a Python loop over small
        # numpy ops that never release the GIL long enough — threads
        # monotonically DEGRADE latency (6-term hot query: 1=1163ms,
        # 2=1623ms, 4=5074ms, 8=7081ms; pure GIL convoy).  Default is
        # therefore serial; the knob + bit-parity test stay for a
        # free-threaded/nogil future.  The tail fix that worked is in
        # the kernel instead: query/wand.py dense-query exhaustive
        # mode + codec.py decode fast paths (1163 -> 264ms same query).
        self.serving_threads = 1
        self._serving_pool = None
        self._serving_pool_size = 0
        self.refresh()

    def refresh(self) -> "SearchEngine":
        """(Re)load index state.  MUST be called after any mutation of
        the index directory by another component (append_documents,
        compact_index) — a stale engine would otherwise score with an
        outdated n_docs/avgdl (wrong idf and bound_scale) and hold a
        pyarrow dataset over deleted segment files."""
        from search_engine_spark.catalog import store_for

        self.store = store_for(self.index_dir)
        self.meta = self.store.get_meta(self.spark)
        for df in (getattr(self, "segments", None), getattr(self, "df_table", None)):
            if df is not None and self._cache_plans:
                df.unpersist()
        for t in ("segments", "df", "docmap"):
            self.store.refresh(self.spark, t)
        self.segments = self.store.read(self.spark, "segments")
        self.df_table = self.store.read(self.spark, "df")
        self.docmap = self.store.read(self.spark, "docmap")
        if self._cache_plans:
            self.segments = self.segments.cache()
            self.df_table = self.df_table.cache()
        self._local_ds = None
        from collections import OrderedDict as _OD

        self._bucket_cache: "_OD[int, dict[str, list]]" = _OD()
        self._bucket_cache_nbytes: dict[int, int] = {}
        # term -> (rows holding a "_chunk" TermChunk, decoded nbytes);
        # generation-scoped exactly like the bucket cache above
        self._decoded_cache: "_OD[str, tuple[list, int]]" = _OD()
        self._decoded_nbytes = 0
        self._df_cache: dict[str, int] = {}
        self._dym_dict: tuple[int, set[str]] | None = None
        # full content-namespace {term: df} for serving-side fuzzy /
        # prefix expansion; built lazily once per generation
        self._local_vocab: dict[str, int] | None = None
        # S8 result cache: dropped wholesale per engine generation so a
        # refresh() after append/compact can never serve stale results
        self._result_cache = None
        # phrase support (indexer/positions.py): lazily-read positional
        # segments, the per-generation staleness verdict, the last
        # query's persisted candidate set, and the serving path's
        # doclen array + pyarrow dataset handle
        old = getattr(self, "_phrase_matches", None)
        if old is not None:
            old.unpersist()
        self._possegments = None
        self._pos_ok: bool | None = None
        self._phrase_matches: DataFrame | None = None
        self._doclen_arr = None
        self._pos_local_ds = None
        self._term_slab_cache: dict[str, frozenset] | None = (
            {} if self.store.kind == "parquet"
            and self.store.exists("term_slabs")
            else None
        )
        # tombstones (delete_documents): False = not yet loaded this
        # generation; None = none pending; ndarray = sorted global
        # docids.  Loaded lazily, dropped by refresh() like every
        # other generation-scoped cache.
        self._tomb: "bool | None" = False
        self._tombdf = None
        # serving-tier docmap field arrays (facets), per generation
        self._field_arrs: dict = {}
        # serving-tier numeric doc-values arrays (range filters:
        # dateFrom/dateTo/minContentQuality), per generation
        self._dv_arrs: dict = {}
        return self

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
        pred = F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        slabs = self._slabs_for(terms)
        if slabs is not None:
            # partition pruning: segments/ is partitioned by slab, so
            # slabs no query term occurs in are never even listed
            pred = pred & F.col("slab").isin(sorted(slabs))
        return self.segments.filter(pred)

    def _slabs_for(self, terms: list[str]):
        """Union of slabs the query terms occur in, from the tiny
        (term, slab) inventory written at build time — read driver-
        side via pyarrow (no Spark job) and cached per engine
        generation.  Returns None (no pruning) when the inventory is
        absent (pre-term_slabs index) or the store is catalog-backed."""
        cache = self._term_slab_cache
        if cache is None:
            return None
        missing = [t for t in terms if t not in cache]
        if missing:
            import pyarrow.dataset as ds

            tab = ds.dataset(f"{self.index_dir}/term_slabs").to_table(
                filter=ds.field("term").isin(missing),
                columns=["term", "slab"],
            )
            got: dict[str, set] = {}
            for t, s in zip(
                tab.column("term").to_pylist(), tab.column("slab").to_pylist()
            ):
                got.setdefault(t, set()).add(int(s))
            for t in missing:
                cache[t] = frozenset(got.get(t, ()))
        out: set[int] = set()
        for t in terms:
            out |= cache[t]
        return out

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

    # -- deletes (tombstones) --------------------------------------------
    def delete(self, docids=None, where=None) -> int:
        """Tombstone documents (indexer.build.delete_documents) and
        refresh this engine so queries exclude them immediately.
        Stats (n_docs/avgdl/df) stay pre-delete until a purging
        compact_index (which also clears the tombstones) — the Lucene
        deleted-docs rule.  Returns the live tombstone count."""
        from search_engine_spark.indexer.build import delete_documents

        n = delete_documents(self.spark, self.index_dir, docids, where)
        self.refresh()
        return n

    def _tombstones_arr(self):
        """Sorted global docids pending deletion, or None.  The
        live-deletes working set (Lucene liveDocs analog): bounded
        driver-side until compaction reclaims it."""
        if self._tomb is False:
            import numpy as np

            if self.store.exists("tombstones", self.spark):
                if self.store.kind == "parquet":
                    import pyarrow.dataset as ds

                    ids = (
                        ds.dataset(f"{self.index_dir}/tombstones")
                        .to_table(columns=["docid"])
                        .column("docid")
                        .to_numpy()
                    )
                else:
                    ids = np.array(
                        [
                            int(r["docid"])
                            for r in self.store.read(
                                self.spark, "tombstones"
                            ).collect()
                        ],
                        dtype=np.int64,
                    )
                self._tomb = (
                    np.unique(ids.astype(np.int64)) if len(ids) else None
                )
            else:
                self._tomb = None
        return self._tomb

    def _n_tomb(self) -> int:
        t = self._tombstones_arr()
        return 0 if t is None else len(t)

    def _drop_tombstones(self, df: DataFrame) -> DataFrame:
        """Anti-join (docid) against the pending-delete set; no-op
        without tombstones.  Exactness of the over-fetch pattern used
        by the Spark-side top-k paths: a path that fetched
        top-(k + |tombstones|) per group can lose at most
        |tombstones| rows to this filter, so filtering then cutting
        to k equals kernel-level exclusion (scores of surviving docs
        are unaffected by other docs' deletion)."""
        t = self._tombstones_arr()
        if t is None:
            return df
        if self._tombdf is None:
            self._tombdf = self.spark.createDataFrame(
                [(int(d),) for d in t], "docid long"
            )
        return df.join(F.broadcast(self._tombdf), "docid", "left_anti")

    def _tomb_locals_by_slab(self, slabs) -> dict:
        """{slab: sorted slab-LOCAL deleted docids} for the serving
        kernels' exclusion sets."""
        import numpy as np

        t = self._tombstones_arr()
        if t is None:
            return {}
        ss = int(self.meta["slab_size"])
        out = {}
        for s in slabs:
            lo = np.searchsorted(t, s * ss)
            hi = np.searchsorted(t, (s + 1) * ss)
            if hi > lo:
                out[s] = t[lo:hi] - s * ss
        return out

    @staticmethod
    def _filter_groups(filters: "dict | None") -> list[list[str]]:
        """bool.filter spec -> keyword-term groups: one group per
        field (sorted for determinism), OR within a group (a list
        value), AND across groups."""
        if not filters:
            return []
        from search_engine_spark.indexer.postings import meta_term

        groups = []
        for f_ in sorted(filters):
            v = filters[f_]
            vals = v if isinstance(v, (list, tuple, set)) else [v]
            groups.append(sorted(meta_term(f_, x) for x in vals))
        return groups

    def search(
        self,
        query: str,
        k: int = 10,
        expand: bool = False,
        mode: str = "or",
        intent: bool = False,
        exclude: str | None = None,
        after: tuple[float, int] | None = None,
        filter: "dict | None" = None,
        date_from: "str | int | None" = None,
        date_to: "str | int | None" = None,
        min_quality: float | None = None,
        min_should_match: "int | str | None" = None,
    ) -> DataFrame:
        """Top-k (docid, score) via per-slab block-max WAND.

        ``expand=True`` applies the reference's query expansion
        (misspelling correction + weighted synonyms, SO3/X5): each
        term's contribution becomes w_t * idf_t * tfn — the WAND
        executor consumes the product as the term weight, so pruning
        bounds remain exact.

        ``mode="and"`` is ES bool.must (SURVEY J4): only documents
        containing EVERY query term are returned, still BM25-scored.
        Combine with ``expand=True`` only deliberately — expansion
        terms then become required too.

        ``intent=True`` applies the reference's rule-based intent
        classifier (query/intent.py): a TUTORIAL-intent query gains
        the spec's extra should-terms at weight 1.0.

        ``exclude`` is ES bool.must_not: documents containing ANY of
        its (tokenized) terms are dropped from the result.  Exclusion
        chunks ride the same per-slab groups as the scored terms
        (NULL-idf rows), so must_not costs one extra pruned segment
        scan and no extra shuffle.

        ``after`` is ES search_after keyset pagination: the exact
        (score, docid) of the previous page's last hit; only documents
        strictly after that cursor in (score desc, docid asc) order
        are returned.  Unlike from/size (W2, paginate()), a deep page
        never materializes the pages before it — at 100 TB this is the
        only sane way to scroll far into a result set, which is why ES
        deprecated deep from/size in favor of search_after.  The
        cursor filter is applied INSIDE the per-slab kernels before
        candidates enter the running top-k, so WAND pruning bounds
        stay exact (dropping documents only lowers admissible scores).
        A cursor is valid for the path that issued it (this method or
        search_local respectively): the two paths' scores agree to
        1e-12 but not always bitwise, and the tie rule compares exact
        floats — the same contract ES sort values carry.

        ``filter`` is ES bool.filter (non-scoring context): a dict of
        docmap field -> value (or list of values, OR'd); fields AND
        together.  Filters push down INTO the index as `m#field=value`
        keyword postings (cfg.index_fields), so term/bucket/slab
        pruning applies to the filter clauses too, admission happens
        inside the kernels, and scores are untouched.

        ``date_from``/``date_to``/``min_quality`` complete the
        SearchRequestDTO surface (SearchRequestDTO.java:22-24; the
        reference's ES adapter plumbs the params but never applies
        them — implemented here as the declared semantics, the sortBy
        precedent): numeric RANGE filters in filter context.  Dates
        are ISO strings (or day offsets) against the deterministic
        synthetic publish day (ops/ranking.pub_day_col — the sortBy
        "date" key, so sorting and filtering agree); min_quality
        bounds the docmap's materialized F13 quality.  Ranges ride the
        same kernel admission as bool.filter: a per-slab admissible
        set is computed from a column-pruned docmap scan (docid +
        quality only — the Lucene doc-values analog; the day needs no
        scan at all, it is a pure function of docid) and shipped into
        the per-slab groups as raw-int64 rows, so scores stay bitwise
        those of the unfiltered ranking and WAND bounds stay exact.

        ``min_should_match`` is the ES param of the same name: only
        documents matching at least m DISTINCT clauses are returned
        (int, or "P%" of the clause count rounded down — the ES
        percentage rule).  m-of-n sits between OR (m<=1) and
        ``mode="and"`` (m=n, which overrides); with ``expand=True`` /
        ``intent=True`` the clause count includes expansion clauses,
        like an ES bool.should of the rewritten query.  Enforced by
        the kernels' distinct-chunk counting (the bool.must machinery
        with a lower threshold), so WAND pruning stays exact.
        """
        if expand:
            from search_engine_spark.query.expansion import expand_query

            weights = expand_query(query)
        else:
            weights = {t: 1.0 for t in tokenize_query(query)}
        if intent:
            from search_engine_spark.query.intent import intent_extra_weights

            for t, w in intent_extra_weights(query).items():
                weights.setdefault(t, w)
        exclude_terms = tokenize_query(exclude) if exclude else None
        return self._search_weights(
            weights, k, mode=mode, exclude_terms=exclude_terms,
            after=after, filters=filter,
            ranges=_dto_ranges(date_from, date_to, min_quality),
            min_should_match=min_should_match,
        )

    def _search_weights(
        self,
        weights: dict[str, float],
        k: int = 10,
        mode: str = "or",
        exclude_terms: list[str] | None = None,
        after: tuple[float, int] | None = None,
        filters: "dict | None" = None,
        ranges: "list[tuple[str, float | None, float | None]] | None" = None,
        min_should_match: "int | str | None" = None,
    ) -> DataFrame:
        """Weighted-clause WAND core shared by search / search_fuzzy /
        search_prefix: per-term contribution = w_t * idf_t * tfn (the
        weight folds into idf, so pruning bounds remain exact).
        ``exclude_terms`` (bool.must_not) join as NULL-idf rows the
        scorer decodes into per-slab exclusion sets.  ``ranges``
        [(field, lo, hi)] are numeric doc-values filters (see
        search()); each becomes one more admission group of raw-int64
        rows packed from the docmap."""
        terms = list(weights)
        if not terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        m = self.meta
        seg = self._pruned_segments(terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        idfs = self._idf_rows(terms)
        if any(w != 1.0 for w in weights.values()):
            wmap = F.create_map(
                *[F.lit(x) for t, w in weights.items() for x in (t, float(w))]
            )
            idfs = idfs.withColumn("idf", F.col("idf") * wmap[F.col("term")])
        seg = seg.join(F.broadcast(idfs), "term")
        if exclude_terms:
            neg = (
                self._pruned_segments(exclude_terms)
                .select("slab", "term", "postings", "skips", "block_max")
                .withColumn("idf", F.lit(None).cast("double"))
                .select(*seg.columns)
            )
            seg = seg.unionByName(neg)
        groups = self._filter_groups(filters)
        rngs = [r for r in (ranges or []) if r[1] is not None or r[2] is not None]
        if groups or rngs:
            seg = seg.withColumn("inc", F.lit(None).cast("int"))
        if groups:
            for gi, gterms in enumerate(groups):
                fseg = (
                    self._pruned_segments(gterms)
                    .select("slab", "term", "postings", "skips", "block_max")
                    .withColumn("idf", F.lit(None).cast("double"))
                    .withColumn("inc", F.lit(gi).cast("int"))
                    .select(*seg.columns)
                )
                seg = seg.unionByName(fseg)
            # slab intersection: a phrase-style AND across groups — a
            # slab where some field value never occurs cannot produce
            # an admissible doc, so skip it before any scan
            if self._term_slab_cache is not None:
                allowed = self._slabs_for(terms)
                for gterms in groups:
                    gs = self._slabs_for(gterms)
                    allowed = (
                        gs if allowed is None
                        else (allowed & gs if gs is not None else allowed)
                    )
                if allowed is not None:
                    if not allowed:
                        return self.spark.createDataFrame([], TOPK_SCHEMA)
                    seg = seg.filter(F.col("slab").isin(sorted(allowed)))
        if rngs:
            # doc-values admission rows: one group per range, packed
            # from a column-pruned docmap scan; pruned to the slabs the
            # scored terms occur in (a range row for a slab with no
            # scored chunks could never contribute)
            adm_slabs = (
                self._slabs_for(terms)
                if self._term_slab_cache is not None else None
            )
            for i, rng in enumerate(rngs):
                rseg = self._range_admission_rows(rng, len(groups) + i)
                if adm_slabs is not None:
                    rseg = rseg.filter(
                        F.col("slab").isin(sorted(adm_slabs))
                    )
                seg = seg.unionByName(rseg.select(*seg.columns))
        bound_scale = max(1.0, float(m["avgdl"]) / float(m["norm_avgdl"]))
        scorer = make_slab_scorer(
            int(m["slab_size"]),
            int(m["block_size"]),
            k + self._n_tomb(),  # over-fetch covers pending deletes
            float(m["k1"]),
            float(m["b"]),
            float(m["avgdl"]),
            bound_scale,
            n_required=(
                len(terms) if mode == "and"
                else _msm_count(min_should_match, len(terms))
            ),
            after=after,
            n_filter_groups=len(groups) + len(rngs),
        )
        per_slab = seg.groupBy("slab").applyInPandas(scorer, schema=TOPK_SCHEMA)
        return (
            self._drop_tombstones(per_slab)
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def _range_admission_rows(self, rng, gi: int) -> DataFrame:
        """One doc-values range -> admission rows (slab, RAW_INC_TERM,
        raw-int64 postings, NULL skips/block_max/idf, inc=gi), one row
        per slab holding at least one admissible doc.

        The docmap IS the doc-values store: parquet is columnar, so
        the scan reads exactly (docid, quality) — nothing content-
        sized ships — and the range predicate pushes into it.  The
        synthetic publish day needs no scan at all (a pure function of
        docid, shared with sortBy="date").  One narrow shuffle to
        (slab) packs the admissible docids; at 100 TB the heavy
        per-value filtering work stays columnar and distributed, and
        the hot-path alternative for a REPEATED categorical range is
        the m#field=value keyword postings (bool.filter), which skip
        the docmap entirely.
        """
        field, lo, hi = rng
        src = self.docmap.select(
            F.col("docid").cast("long").alias("docid"),
            self._dv_value_col(field).alias("_v"),
        )
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("_v") >= float(lo))
        if hi is not None:
            cond = cond & (F.col("_v") <= float(hi))
        return pack_admission_rows(
            src.filter(cond), int(self.meta["slab_size"]), gi
        )

    def _dv_value_col(self, field: str):
        """docmap Column for a doc-values range field: materialized
        quality (with the query-time F13 fallback for legacy
        pre-quality docmaps — the search_ranked discipline) or the
        pure-docid publish day.  Shared by the kernel-admission and
        candidate-set (search_sorted / use-case) range paths."""
        from search_engine_spark.ops.ranking import pub_day_col

        if field == "quality":
            if "quality" in self.docmap.columns:
                return F.col("quality").cast("double")
            from search_engine_spark.ops.ranking import quality_col
            from search_engine_spark.tokenizer import tokens_col

            return quality_col(
                F.col("content"), tokens_col("content")
            ).cast("double")
        if field == "day":
            return pub_day_col(F.col("docid")).cast("double")
        raise ValueError(f"unknown range field {field!r}")

    def _content_vocab(self):
        """(term, df) over the CONTENT namespace — the fuzzy/prefix
        expansion dictionary (title terms live under TITLE_PREFIX,
        metadata keyword terms under META_PREFIX — neither can match a
        bare query token)."""
        from search_engine_spark.config import META_PREFIX, TITLE_PREFIX

        return self.df_table.filter(
            ~F.col("term").startswith(TITLE_PREFIX)
            & ~F.col("term").startswith(META_PREFIX)
        ).select("term", "df")

    def fuzzy_weights(
        self, query: str, max_edits: int = 1, max_expansions: int = 50
    ) -> dict[str, float]:
        """Merged clause weights for ES-style fuzzy matching: each
        vocabulary term within levenshtein <= max_edits of a query
        term is a clause at the Lucene boost 1 - d/min(|q|,|t|),
        capped per query term at the max_expansions highest-df terms
        (query/fuzzy.py freezes the semantics).  A term reached from
        two query terms sums its boosts — algebraically identical to
        scoring the clauses separately, since contribution is linear
        in the boost.  The expansion is computed as a DataFrame
        against the df table (a length-band broadcast hash join, no
        driver-side vocabulary) and only the <= n_terms *
        max_expansions surviving rows are collected."""
        from search_engine_spark.query.fuzzy import fuzzy_expansions

        terms = tokenize_query(query)
        if not terms:
            return {}
        exp = fuzzy_expansions(
            self._content_vocab(), terms, max_edits, max_expansions
        )
        rows = sorted(
            (int(r["qi"]), r["term"], float(r["boost"]))
            for r in exp.select("qi", "term", "boost").collect()
        )
        # summed in (qi, term) order — the serving twin
        # (search_local_fuzzy) merges in the same order, so the two
        # paths' float sums are bit-identical
        weights: dict[str, float] = {}
        for _qi, term, boost in rows:
            weights[term] = weights.get(term, 0.0) + boost
        return weights

    def prefix_weights(
        self, prefix: str, max_expansions: int = 50
    ) -> dict[str, float]:
        """scoring_boolean prefix rewrite: the max_expansions
        highest-df vocabulary terms with the prefix, weight 1.0."""
        from search_engine_spark.query.fuzzy import prefix_expansions

        exp = prefix_expansions(self._content_vocab(), prefix, max_expansions)
        return {r["term"]: 1.0 for r in exp.select("term").collect()}

    def search_fuzzy(
        self,
        query: str,
        k: int = 10,
        max_edits: int = 1,
        max_expansions: int = 50,
    ) -> DataFrame:
        """ES `match` with fuzziness through the real index path."""
        return self._search_weights(
            self.fuzzy_weights(query, max_edits, max_expansions), k
        )

    def search_prefix(
        self, prefix: str, k: int = 10, max_expansions: int = 50
    ) -> DataFrame:
        """ES `prefix` query (scoring_boolean rewrite) through the
        real index path."""
        return self._search_weights(
            self.prefix_weights(prefix, max_expansions), k
        )

    def search_fields(
        self, query: str, k: int = 10, expand: bool = False,
        intent: bool = False,
    ) -> DataFrame:
        """Field-weighted top-k with BM25F-style cross-field SUM.

        DELIBERATE divergence from the reference's multi_match
        BEST_FIELDS (docs/features/query-expansion-nlp.md:260-275),
        which takes the MAX over fields per clause: this method sums
        title and content contributions (BM25F-shaped — a doc matching
        in both fields ranks higher).  The faithful BEST_FIELDS
        dis_max semantics live in ``search_advanced``; boosts
        (title^3.0/content^1.0, synonyms title^2.0/content^0.8 when
        ``expand``) are the reference's in both.
        Per-field BM25 statistics: each field's chunks carry
        their own df, avgdl and block-max bounds (encoded with that
        field's avgdl at build time), so WAND pruning stays exact:
        UB(block) = sum over (term, field) of boost * idf * block_max.
        """
        from search_engine_spark.config import TITLE_PREFIX
        from search_engine_spark.query.expansion import field_weights

        m = self.meta
        if not m.get("index_title"):
            raise ValueError(
                "index was built with index_title=False; rebuild to use "
                "field-weighted search"
            )
        fw = field_weights(query, expand=expand)
        if not fw:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        av_c, av_t = float(m["avgdl"]), float(m["avgdl_title"])
        bs_c = max(1.0, av_c / float(m["norm_avgdl"]))
        bs_t = max(1.0, av_t / float(m["norm_avgdl_title"]))
        rows = []
        for t, w_c, w_t in fw:
            rows.append((t, float(w_c), av_c, bs_c))
            rows.append((TITLE_PREFIX + t, float(w_t), av_t, bs_t))
        if intent:
            # TUTORIAL should-terms as content-only clauses (weight
            # 1.0), matching search(intent=True)'s semantics per field
            from search_engine_spark.query.intent import (
                intent_extra_weights,
            )

            have = {t for t, _wc, _wt in fw}
            for t, w in intent_extra_weights(query).items():
                if t not in have:
                    rows.append((t, float(w), av_c, bs_c))
        terms = [r[0] for r in rows]
        wdf = self.spark.createDataFrame(
            rows, "term string, w double, avgdl double, bscale double"
        )
        n = float(m["n_docs"])
        idfs = (
            self.df_table.filter(F.col("term").isin(terms))
            .join(F.broadcast(wdf), "term")
            .withColumn(
                "idf",
                F.col("w")
                * F.log1p((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            )
            .select("term", "idf", "avgdl", "bscale")
        )
        seg = self._pruned_segments(terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        joined = seg.join(F.broadcast(idfs), "term")
        scorer = make_slab_scorer(
            int(m["slab_size"]),
            int(m["block_size"]),
            k + self._n_tomb(),
            float(m["k1"]),
            float(m["b"]),
            av_c,
        )
        per = joined.groupBy("slab").applyInPandas(scorer, schema=TOPK_SCHEMA)
        return (
            self._drop_tombstones(per)
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def search_advanced(
        self,
        query: str,
        k: int = 10,
        pagerank: DataFrame | None = None,
        missing: float = 0.0,
        mode: str = "or",
    ) -> DataFrame:
        """The reference's COMPLETE composed query in one call
        (AdvancedSearchService, docs/features/query-expansion-nlp.md:
        246-300): corrected original terms as ONE BEST_FIELDS clause
        (title^3/content^1, dis_max over fields), per-synonym clauses
        (title^2/content^0.8, dis_max over fields), the TUTORIAL-intent
        content clause, entity content clauses — summed across clauses
        — then function_score MULTIPLY by log1p(2 * pagerank) applied
        INSIDE the per-slab WAND stage over ALL candidates (per-block
        boost maxima keep pruning exact; multiply is monotone).

        ``pagerank``: (node|docid, pagerank) DataFrame; docs absent
        boost at log1p(2 * missing).  ``pagerank=None`` skips the
        function_score stage entirely (pure bool score).

        ``mode="and"`` requires every corrected ORIGINAL term (in
        either field); synonym/intent/entity clauses stay optional —
        unlike ``search(mode="and", expand=True)``, expansion terms
        are never required here.
        """
        from search_engine_spark.config import TITLE_PREFIX
        from search_engine_spark.query.advanced import (
            FLD_CONTENT,
            PAGERANK_FACTOR,
            advanced_plan,
            plan_orig_terms,
        )
        from search_engine_spark.query.wand import (
            make_adv_slab_scorer,
            make_adv_slab_scorer_plain,
        )

        m = self.meta
        if not m.get("index_title"):
            raise ValueError(
                "index was built with index_title=False; rebuild to use "
                "the composed query"
            )
        plan = advanced_plan(query)
        if not plan:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        av_c, av_t = float(m["avgdl"]), float(m["avgdl_title"])
        bs_c = max(1.0, av_c / float(m["norm_avgdl"])) if av_c else 1.0
        bs_t = max(1.0, av_t / float(m["norm_avgdl_title"])) if av_t else 1.0
        orig = plan_orig_terms(query)
        req_of = {t: i for i, t in enumerate(orig)}
        rows = []
        for clause, fld, t, w in plan:
            req = req_of.get(t, -1) if clause == 0 else -1
            if fld == FLD_CONTENT:
                rows.append((t, float(w), av_c, bs_c, clause, 0, req))
            else:
                rows.append(
                    (TITLE_PREFIX + t, float(w), av_t, bs_t, clause, 1, req)
                )
        terms = list({r[0] for r in rows})
        wdf = self.spark.createDataFrame(
            rows,
            "term string, w double, avgdl double, bscale double, "
            "clause int, fld int, req int",
        )
        n = float(m["n_docs"])
        idfs = (
            self.df_table.filter(F.col("term").isin(terms))
            .join(F.broadcast(wdf), "term")
            .withColumn(
                "idf",
                F.col("w")
                * F.log1p((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            )
            .select("term", "idf", "avgdl", "bscale", "clause", "fld", "req")
        )
        seg = self._pruned_segments(terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        joined = seg.join(F.broadcast(idfs), "term")
        n_required = len(orig) if mode == "and" else 0
        kk = k + self._n_tomb()  # over-fetch covers pending deletes
        if pagerank is None:
            scorer = make_adv_slab_scorer_plain(
                int(m["slab_size"]), int(m["block_size"]), kk,
                float(m["k1"]), float(m["b"]), n_required=n_required,
            )
            per = joined.groupBy("slab").applyInPandas(
                scorer, schema=TOPK_SCHEMA
            )
        else:
            slab_size = int(m["slab_size"])
            pr = pagerank.select(
                F.col(pagerank.columns[0]).cast("long").alias("docid"),
                F.col(pagerank.columns[1]).cast("double").alias("pr"),
            ).withColumn("slab", (F.col("docid") / slab_size).cast("int"))
            scorer = make_adv_slab_scorer(
                slab_size, int(m["block_size"]), kk,
                float(m["k1"]), float(m["b"]), PAGERANK_FACTOR,
                missing=missing, n_required=n_required,
            )
            per = (
                joined.groupBy("slab")
                .cogroup(pr.groupBy("slab"))
                .applyInPandas(scorer, schema=TOPK_SCHEMA)
            )
        return (
            self._drop_tombstones(per)
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def search_advanced_with_meta(
        self,
        query: str,
        k: int = 10,
        pagerank: DataFrame | None = None,
        missing: float = 0.0,
        highlight: bool = True,
        mode: str = "or",
    ) -> DataFrame:
        """Composed query + presentation: docmap metadata, <mark>-ed
        title and query-term-centered <mark>-ed content snippet — the
        reference request's HighlightBuilder stage.  Highlight terms
        include synonyms and intent/entity terms (ES highlights every
        matched should-clause term)."""
        from search_engine_spark.indexer.docmap import title_col
        from search_engine_spark.query.advanced import (
            advanced_plan,
            plan_mark_terms,
        )
        from search_engine_spark.query.highlight import (
            highlight_snippet_col,
            mark_col,
        )

        topk = self.search_advanced(query, k, pagerank=pagerank,
                                    missing=missing, mode=mode)
        terms = plan_mark_terms(advanced_plan(query))
        if highlight:
            snippet = highlight_snippet_col("content", terms)
            title = mark_col(title_col("path"), terms)
        else:
            snippet = F.substring("content", 1, 200)
            title = title_col("path")
        return (
            self.docmap.join(F.broadcast(topk), "docid")
            .select(
                "docid", "score", "repo", "path", "commit", "lang",
                title.alias("title"),
                snippet.alias("snippet"),
            )
            .orderBy(F.desc("score"), F.asc("docid"))
        )

    def search_batch(
        self,
        queries: dict[str, str],
        k: int = 10,
        expand: bool = False,
        mode: str = "or",
        intent: bool = False,
    ) -> DataFrame:
        """Score MANY queries in one job -> (qid, docid, score, rank).

        The throughput path: a (qid, term, idf) broadcast joins the
        segments scan once; (qid, slab) groups run WAND concurrently;
        a per-qid ranking window takes the global top-k.

        ``expand``/``mode``/``intent`` carry the single-query
        ``search()`` semantics per qid (rank-identical; pinned in
        pytest): expansion weights multiply idf, ``mode="and"``
        requires every term of that query (expansion terms included,
        same sharp edge as ``search``), TUTORIAL-intent queries gain
        the extra should-terms.
        """
        from search_engine_spark.query.wand import (
            BATCH_TOPK_SCHEMA,
            make_batch_slab_scorer,
        )
        from pyspark.sql import Window

        m = self.meta
        n = float(m["n_docs"])
        rows = []
        for qid, q in queries.items():
            if expand:
                from search_engine_spark.query.expansion import expand_query

                weights = expand_query(q)
            else:
                weights = {t: 1.0 for t in tokenize_query(q)}
            if intent:
                from search_engine_spark.query.intent import (
                    intent_extra_weights,
                )

                for t, w in intent_extra_weights(q).items():
                    weights.setdefault(t, w)
            nreq = len(weights) if mode == "and" else 0
            for i, (t, w) in enumerate(weights.items()):
                rows.append((qid, t, float(w), nreq, i))
        if not rows:
            return self.spark.createDataFrame(
                [], BATCH_TOPK_SCHEMA + ", rank int"
            )
        uniq_terms = list({r[1] for r in rows})
        qt = self.spark.createDataFrame(
            rows, "qid string, term string, w double, nreq int, req int"
        )
        qt = qt.join(
            self.df_table.filter(F.col("term").isin(uniq_terms)),
            "term",
        ).withColumn(
            "idf",
            F.col("w")
            * F.log1p((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        ).select("qid", "term", "idf", "nreq", "req")
        seg = self._pruned_segments(uniq_terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        joined = seg.join(F.broadcast(qt), "term")
        bound_scale = max(1.0, float(m["avgdl"]) / float(m["norm_avgdl"]))
        scorer = make_batch_slab_scorer(
            int(m["slab_size"]),
            int(m["block_size"]),
            k + self._n_tomb(),  # over-fetch covers pending deletes
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
            self._drop_tombstones(per)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def search_batch_fields(
        self,
        queries: dict[str, str],
        k: int = 10,
        expand: bool = False,
        intent: bool = False,
    ) -> DataFrame:
        """Field-weighted search for MANY queries in one job — the
        batch-throughput form of ``search_fields`` (same per-field
        weights/statistics, (qid, slab) WAND groups, per-qid top-k;
        ``intent`` adds the TUTORIAL content-only should-terms per
        qid, rank-identical to the single-query path)."""
        from pyspark.sql import Window

        from search_engine_spark.config import TITLE_PREFIX
        from search_engine_spark.query.expansion import field_weights
        from search_engine_spark.query.wand import (
            BATCH_TOPK_SCHEMA,
            make_batch_slab_scorer,
        )

        m = self.meta
        if not m.get("index_title"):
            raise ValueError(
                "index was built with index_title=False; rebuild to use "
                "field-weighted search"
            )
        av_c, av_t = float(m["avgdl"]), float(m["avgdl_title"])
        bs_c = max(1.0, av_c / float(m["norm_avgdl"])) if av_c else 1.0
        bs_t = max(1.0, av_t / float(m["norm_avgdl_title"])) if av_t else 1.0
        rows = []
        for qid, q in queries.items():
            fw = field_weights(q, expand=expand)
            for t, w_c, w_t in fw:
                rows.append((qid, t, float(w_c), av_c, bs_c))
                rows.append((qid, TITLE_PREFIX + t, float(w_t), av_t, bs_t))
            if intent:
                from search_engine_spark.query.intent import (
                    intent_extra_weights,
                )

                have = {t for t, _wc, _wt in fw}
                for t, w in intent_extra_weights(q).items():
                    if t not in have:
                        rows.append((qid, t, float(w), av_c, bs_c))
        if not rows:
            return self.spark.createDataFrame(
                [], BATCH_TOPK_SCHEMA + ", rank int"
            )
        uniq_terms = list({r[1] for r in rows})
        qt = self.spark.createDataFrame(
            rows, "qid string, term string, w double, avgdl double, bscale double"
        )
        n = float(m["n_docs"])
        qt = (
            qt.join(
                self.df_table.filter(F.col("term").isin(uniq_terms)), "term"
            )
            .withColumn(
                "idf",
                F.col("w")
                * F.log1p((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            )
            .select("qid", "term", "idf", "avgdl", "bscale")
        )
        seg = self._pruned_segments(uniq_terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        joined = seg.join(F.broadcast(qt), "term")
        scorer = make_batch_slab_scorer(
            int(m["slab_size"]),
            int(m["block_size"]),
            k + self._n_tomb(),
            float(m["k1"]),
            float(m["b"]),
            av_c,
        )
        per = joined.groupBy("qid", "slab").applyInPandas(
            scorer, schema=BATCH_TOPK_SCHEMA
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
        return (
            self._drop_tombstones(per)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def search_batch_advanced(
        self,
        queries: dict[str, str],
        k: int = 10,
        pagerank: DataFrame | None = None,
        missing: float = 0.0,
        mode: str = "or",
    ) -> DataFrame:
        """The COMPOSED query (``search_advanced``) for MANY queries in
        one job -> (qid, docid, score, rank) — completing the batch
        feature matrix (plain/fields/advanced each have a batch twin).

        Per-qid semantics are ``search_advanced``'s exactly (pinned in
        pytest): BEST_FIELDS originals, per-synonym clauses, intent +
        entity clauses, optional function_score MULTIPLY
        log1p(2*pagerank) over ALL candidates, ``mode="and"``
        requiring every corrected original term.

        Shapes: without pagerank, (qid, slab) groups like
        ``search_batch``.  With pagerank, groups are per SLAB and the
        pagerank rows cogroup once per slab — the boost vector is
        query-independent, so it is built once and shared by every
        query in the batch instead of replicating the pagerank table
        per qid (the scale-relevant choice at 100 TB).  Queries whose
        plan is empty (all terms tokenized away) yield no rows, as in
        ``search_batch``.
        """
        from pyspark.sql import Window

        from search_engine_spark.config import TITLE_PREFIX
        from search_engine_spark.query.advanced import (
            FLD_CONTENT,
            PAGERANK_FACTOR,
            advanced_plan,
            plan_orig_terms,
        )
        from search_engine_spark.query.wand import (
            BATCH_TOPK_SCHEMA,
            make_batch_adv_cogroup_scorer,
            make_batch_adv_slab_scorer,
        )

        m = self.meta
        if not m.get("index_title"):
            raise ValueError(
                "index was built with index_title=False; rebuild to use "
                "the composed query"
            )
        av_c, av_t = float(m["avgdl"]), float(m["avgdl_title"])
        bs_c = max(1.0, av_c / float(m["norm_avgdl"])) if av_c else 1.0
        bs_t = max(1.0, av_t / float(m["norm_avgdl_title"])) if av_t else 1.0
        rows = []
        for qid, q in queries.items():
            plan = advanced_plan(q)
            if not plan:
                continue
            orig = plan_orig_terms(q)
            req_of = {t: i for i, t in enumerate(orig)}
            nreq = len(orig) if mode == "and" else 0
            for clause, fld, t, w in plan:
                req = req_of.get(t, -1) if clause == 0 else -1
                if fld == FLD_CONTENT:
                    rows.append(
                        (qid, t, float(w), av_c, bs_c, clause, 0, req, nreq)
                    )
                else:
                    rows.append(
                        (qid, TITLE_PREFIX + t, float(w), av_t, bs_t,
                         clause, 1, req, nreq)
                    )
        if not rows:
            return self.spark.createDataFrame(
                [], BATCH_TOPK_SCHEMA + ", rank int"
            )
        uniq_terms = list({r[1] for r in rows})
        qt = self.spark.createDataFrame(
            rows,
            "qid string, term string, w double, avgdl double, "
            "bscale double, clause int, fld int, req int, nreq int",
        )
        n = float(m["n_docs"])
        qt = (
            qt.join(
                self.df_table.filter(F.col("term").isin(uniq_terms)), "term"
            )
            .withColumn(
                "idf",
                F.col("w")
                * F.log1p((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
            )
            .select(
                "qid", "term", "idf", "avgdl", "bscale",
                "clause", "fld", "req", "nreq",
            )
        )
        seg = self._pruned_segments(uniq_terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        joined = seg.join(F.broadcast(qt), "term")
        slab_size = int(m["slab_size"])
        if pagerank is None:
            scorer = make_batch_adv_slab_scorer(
                slab_size, int(m["block_size"]), k + self._n_tomb(),
                float(m["k1"]), float(m["b"]),
            )
            per = joined.groupBy("qid", "slab").applyInPandas(
                scorer, schema=BATCH_TOPK_SCHEMA
            )
        else:
            pr = pagerank.select(
                F.col(pagerank.columns[0]).cast("long").alias("docid"),
                F.col(pagerank.columns[1]).cast("double").alias("pr"),
            ).withColumn("slab", (F.col("docid") / slab_size).cast("int"))
            scorer = make_batch_adv_cogroup_scorer(
                slab_size, int(m["block_size"]), k + self._n_tomb(),
                float(m["k1"]), float(m["b"]), PAGERANK_FACTOR,
                missing=missing,
            )
            per = (
                joined.groupBy("slab")
                .cogroup(pr.groupBy("slab"))
                .applyInPandas(scorer, schema=BATCH_TOPK_SCHEMA)
            )
        w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
        return (
            self._drop_tombstones(per)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def _local_term_rows(self, terms: list[str]) -> dict[str, list]:
        """Segment rows (slab/term/postings/skips/block_max) per term
        for the no-Spark serving paths.

        Default mode (``serving_cache_buckets > 0``): rows come from a
        per-BUCKET in-memory cache — the first query touching a bucket
        loads that bucket's segment files once (one pyarrow scan) and
        keeps them decoded, so warm queries do zero file IO and their
        latency is pure kernel cost.  This is what a real serving head
        does with its shard (ES keeps segments in the page cache); the
        LRU cap bounds memory to ``serving_cache_buckets`` of the
        ``term_buckets`` buckets.  ``refresh()`` drops the cache, so a
        generation change can never serve stale postings.

        ``serving_cache_buckets = 0``: per-query pruned scan (term +
        bucket + slab-inventory filters) — bounded memory, pays one
        file-open per matching fragment; this is the mode the
        slab-pruning evidence in BENCH/serving_slabs.jsonl measures.
        """
        import pyarrow.dataset as ds

        from search_engine_spark.indexer.segments import term_bucket_py

        m = self.meta
        if self._local_ds is None:
            self._local_ds = ds.dataset(
                f"{self.index_dir}/segments", partitioning="hive"
            )
        cols = ["slab", "term", "postings", "skips", "block_max"]
        nb = int(m["term_buckets"])
        uniq = list(dict.fromkeys(terms))
        by_term: dict[str, list] = {}
        if self.serving_cache_buckets > 0:
            need: dict[int, list[str]] = {}
            for t in uniq:
                need.setdefault(term_bucket_py(t, nb), []).append(t)
            for b, ts in need.items():
                cached = self._bucket_cache.get(b)
                if cached is None:
                    tab = self._local_ds.to_table(
                        filter=ds.field("bucket") == b, columns=cols
                    )
                    cached = {}
                    for r in tab.to_pylist():
                        cached.setdefault(r["term"], []).append(r)
                    self._bucket_cache[b] = cached
                    # arrow-buffer bytes approximate the decoded rows'
                    # payload (postings/skips/block_max dominate both)
                    self._bucket_cache_nbytes[b] = int(tab.nbytes)
                    while len(self._bucket_cache) > 1 and (
                        len(self._bucket_cache) > self.serving_cache_buckets
                        or sum(self._bucket_cache_nbytes.values())
                        > self.serving_cache_max_bytes
                    ):
                        old, _ = self._bucket_cache.popitem(last=False)
                        self._bucket_cache_nbytes.pop(old, None)
                else:
                    self._bucket_cache.move_to_end(b)
                for t in ts:
                    if t in cached:
                        by_term[t] = cached[t]
                        self._prime_decoded(t, cached[t])
            return by_term
        buckets = sorted({term_bucket_py(t, nb) for t in uniq})
        flt = ds.field("term").isin(uniq) & ds.field("bucket").isin(buckets)
        slabs = self._slabs_for(uniq)
        if slabs is not None:
            flt = flt & ds.field("slab").isin(sorted(slabs))
        tab = self._local_ds.to_table(filter=flt, columns=cols)
        for r in tab.to_pylist():
            by_term.setdefault(r["term"], []).append(r)
        return by_term

    def _prime_decoded(self, term: str, rows: list) -> None:
        """Attach a decoded ``TermChunk`` to each cached segment row of
        ``term`` (LRU under ``serving_decoded_max_bytes``).

        Priming eagerly full-decodes the chunk (``_decode_full`` — the
        same arrays the kernel's adaptive memo would build), so every
        later query on the term is pure vectorized scoring.  Values are
        integers decoded once; whether the kernel then slices blocks or
        takes whole arrays is bit-identical to decoding on demand
        (codec.decode_blocks docstring).  The worst case — a term
        queried once through a pruning-friendly plan — over-decodes by
        at most one full pass, the same bound the adaptive memo accepts.
        """
        if self.serving_decoded_max_bytes <= 0:
            return
        dc = self._decoded_cache
        ent = dc.get(term)
        if ent is not None:
            if ent["rows"] is rows:
                dc.move_to_end(term)
                return
            # the term's bucket was evicted and reloaded: these are new
            # row dicts — drop the stale entry and re-prime
            for r in ent["rows"]:
                r.pop("_chunk", None)
            self._decoded_nbytes -= ent["nb"]
            del dc[term]
        import numpy as np

        from search_engine_spark.indexer.codec import TermChunk

        bs = int(self.meta["block_size"])
        ss = int(self.meta["slab_size"])
        nb = 0
        gid_parts = []
        for r in rows:
            c = TermChunk(r["postings"], r["skips"], r["block_max"])
            c._full = c._decode_full(bs)
            c._full_block_size = bs
            nb += sum(int(a.nbytes) for a in c._full)
            r["_chunk"] = c
            gid_parts.append(c._full[0] + int(r["slab"]) * ss)
        # the term's postings as ONE global array pair: docids here,
        # tf-norm factors lazily on first scoring (keyed by avgdl) —
        # the slab-fused scorer (_fused_dense) runs off these with no
        # per-chunk Python loop in the query path
        gids = (
            gid_parts[0] if len(gid_parts) == 1
            else np.concatenate(gid_parts)
        )
        nb += int(gids.nbytes)
        nb += int(gids.nbytes)  # reserve for the f64 factor array
        dc[term] = {
            "rows": rows, "nb": nb, "gids": gids,
            "fkey": None, "fac": None,
        }
        self._decoded_nbytes += nb
        while len(dc) > 1 and (
            self._decoded_nbytes > self.serving_decoded_max_bytes
        ):
            _, old = dc.popitem(last=False)
            for r in old["rows"]:
                r.pop("_chunk", None)
            self._decoded_nbytes -= old["nb"]

    def _fused_dense(
        self, by_term: dict[str, list], by_slab: dict[int, list],
        idf: dict[str, float], k: int,
        after: tuple[float, int] | None = None,
    ) -> "list[tuple[int, float]] | None":
        """All-slabs-dense fast path for ``search_local`` (OR mode):
        one ``fused_dense_topk`` call over the whole docid space
        instead of a per-slab kernel loop + merge.

        Fires only when EVERY candidate slab's chunk set satisfies the
        same density rule that dispatches ``slab_topk`` to its
        exhaustive scorer — fusion then computes the identical per-doc
        float sums in the identical order (parts iterate ``by_term``
        exactly as the by_slab rows were appended; within one term the
        docids are disjoint, so intra-term order cannot change any
        sum), so results are BIT-IDENTICAL to the per-slab path
        (pinned in pytest).  Gated off with the decoded cache (scan
        mode keeps bounded memory) and when candidate slabs cover
        <50% of the docid space (the dense global array would be
        mostly gap)."""
        if self.serving_decoded_max_bytes <= 0 or len(by_slab) < 2:
            return None
        import numpy as np

        from search_engine_spark.query.wand import fused_dense_topk

        m = self.meta
        ss, bs = int(m["slab_size"]), int(m["block_size"])
        n_grid = (ss + bs - 1) // bs

        def nb(r) -> int:
            c = r.get("_chunk")
            if c is not None:
                return int(c.n_blocks)
            return int(np.frombuffer(r["skips"][:4], dtype=np.int32)[0])

        for rs in by_slab.values():
            if 10 * sum(nb(r) for r in rs) < min(
                20 * n_grid, 9 * n_grid * len(rs)
            ):
                return None
        max_slab = max(by_slab)
        if 2 * len(by_slab) < max_slab + 1:
            return None
        k1, b_, avgdl = float(m["k1"]), float(m["b"]), float(m["avgdl"])
        fkey = (k1, b_, avgdl)
        parts = []
        for t, rows_t in by_term.items():
            if t not in idf:
                continue
            ent = self._decoded_cache.get(t)
            if ent is None or ent["rows"] is not rows_t:
                return None  # not primed (e.g. race with eviction)
            if ent["fac"] is None or ent["fkey"] != fkey:
                from search_engine_spark.indexer.codec import (
                    tf_norm_factor,
                )

                # same per-chunk tf_norm_factor floats the per-slab
                # kernels compute, concatenated in the rows' order
                fac_parts = [
                    tf_norm_factor(
                        r["_chunk"]._full[1], r["_chunk"]._full[2],
                        k1, b_, avgdl,
                    )
                    for r in rows_t
                ]
                ent["fac"] = (
                    fac_parts[0] if len(fac_parts) == 1
                    else np.concatenate(fac_parts)
                )
                ent["fkey"] = fkey
            parts.append((ent["gids"], idf[t], ent["fac"]))
        ids, sc = fused_dense_topk(
            parts, (max_slab + 1) * ss, k, after=after,
        )
        return list(zip(ids.tolist(), sc.tolist()))

    def _run_slabs(self, by_slab: dict[int, list], score_one):
        """Run ``score_one(slab, rows) -> (ids, scores)`` over every
        candidate slab and concatenate the per-slab top-k.

        Slabs partition the docid space, so their kernels share no
        state.  ``serving_threads > 1`` fans them out on a lazily
        created thread pool — kept for a free-threaded future, but
        DEFAULTED OFF because the kernel is GIL-bound and threads
        measurably degrade latency (see __init__).  ``ex.map``
        preserves submission order and the caller re-sorts by
        (-score, docid), so the threaded result is BIT-IDENTICAL to
        the serial loop (pinned in pytest)."""
        items = list(by_slab.items())
        nt = self.serving_threads or min(8, os.cpu_count() or 1)
        results: list[tuple[int, float]] = []
        if nt <= 1 or len(items) <= 1:
            for slab, rs in items:
                ids, sc = score_one(slab, rs)
                results.extend(zip(ids.tolist(), sc.tolist()))
            return results
        if self._serving_pool is None or self._serving_pool_size != nt:
            from concurrent.futures import ThreadPoolExecutor

            if self._serving_pool is not None:
                self._serving_pool.shutdown(wait=False)
            self._serving_pool = ThreadPoolExecutor(
                max_workers=nt, thread_name_prefix="serve-slab"
            )
            self._serving_pool_size = nt
        for ids, sc in self._serving_pool.map(
            lambda it: score_one(*it), items
        ):
            results.extend(zip(ids.tolist(), sc.tolist()))
        return results

    def search_local(
        self,
        query: str,
        k: int = 10,
        exclude: str | None = None,
        after: tuple[float, int] | None = None,
        filter: "dict | None" = None,
        date_from: "str | int | None" = None,
        date_to: "str | int | None" = None,
        min_quality: float | None = None,
        min_should_match: "int | str | None" = None,
    ) -> list[tuple[int, float]]:
        """Serving-path top-k: NO Spark job — pyarrow pruned read of
        the term/bucket segment files + the same numpy block-max WAND
        kernel, per slab, merged on the driver.

        Rank-identical to ``search()`` (same chunks, same kernel,
        same tie-break; asserted in tests).  This is the analog of the
        reference's single-node ES query serving (p99 < 100 ms,
        README.md:226): the index is built distributed; one query's
        top-k is served from pruned index files without cluster
        round-trips.  At 100 TB a serving tier would run many of
        these heads against the same segment store.
        """
        terms = tokenize_query(query)
        if not terms:
            return []
        exclude_terms = tokenize_query(exclude) if exclude else None
        return self._search_local_weights(
            {t: 1.0 for t in terms}, k,
            exclude_terms=exclude_terms, after=after, filters=filter,
            ranges=_dto_ranges(date_from, date_to, min_quality),
            min_should_match=min_should_match,
        )

    def _search_local_weights(
        self,
        weights: dict[str, float],
        k: int = 10,
        exclude_terms: list[str] | None = None,
        after: tuple[float, int] | None = None,
        filters: "dict | None" = None,
        ranges: "list[tuple[str, float | None, float | None]] | None" = None,
        min_should_match: "int | str | None" = None,
    ) -> list[tuple[int, float]]:
        """Weighted-clause serving core (no Spark job): per-term
        contribution = w_t * idf_t * tfn.  ``search_local`` is the
        all-weights-1.0 case; search_local_fuzzy / search_local_prefix
        feed expansion weights.  ``exclude_terms`` (bool.must_not)
        reads the excluded terms' chunks through the same pruned
        pyarrow path and drops their docids per slab before the top-k
        (the fused dense path is bypassed — exclusion queries take the
        per-slab kernels, which accept an exclusion set)."""
        import math as _math

        from search_engine_spark.indexer.codec import TermChunk
        from search_engine_spark.query.wand import slab_topk

        terms = list(weights)
        if not terms:
            return []
        n_req = _msm_count(min_should_match, len(terms))
        m = self.meta
        if self.store.kind != "parquet":
            raise NotImplementedError(
                "the no-Spark serving path reads parquet segment files "
                "directly; with a catalog store, serve via search()"
            )
        by_term = self._local_term_rows(terms)
        if not by_term:
            return []
        n, df_map = float(m["n_docs"]), self._local_df(terms)
        idf = {
            t: weights[t]
            * _math.log(1.0 + (n - df_map[t] + 0.5) / (df_map[t] + 0.5))
            for t in terms
            if t in df_map
        }
        by_slab: dict[int, list] = {}
        for t, rows_t in by_term.items():
            if t in idf:
                for r in rows_t:
                    by_slab.setdefault(int(r["slab"]), []).append(r)
        excl_by_slab: dict[int, "np.ndarray"] = {}
        if exclude_terms:
            import numpy as np

            ex_rows = self._local_term_rows(
                [t for t in dict.fromkeys(exclude_terms)]
            )
            parts: dict[int, list] = {}
            for rows_t in ex_rows.values():
                for r in rows_t:
                    slab = int(r["slab"])
                    if slab not in by_slab:
                        continue  # no scored candidates there anyway
                    c = r.get("_chunk") or TermChunk(
                        r["postings"], r["skips"], r["block_max"]
                    )
                    local, _tf, _dl = c.decode_blocks(
                        np.arange(c.n_blocks, dtype=np.int64),
                        int(m["block_size"]),
                    )
                    parts.setdefault(slab, []).append(local)
            excl_by_slab = {
                s: np.unique(np.concatenate(ps)) for s, ps in parts.items()
            }
        tomb_local = self._tomb_locals_by_slab(by_slab.keys())
        if tomb_local:
            import numpy as np

            for s, arr in tomb_local.items():
                cur = excl_by_slab.get(s)
                excl_by_slab[s] = (
                    arr if cur is None
                    else np.unique(np.concatenate([cur, arr]))
                )
        groups = self._filter_groups(filters)
        inc_by_slab = None
        if groups:
            import numpy as np

            from search_engine_spark.indexer.codec import TermChunk as _TC

            per_group: list[dict[int, list]] = []
            for gterms in groups:
                rows_g = self._local_term_rows(gterms)
                gsets: dict[int, list] = {}
                for rows_t in rows_g.values():
                    for r in rows_t:
                        slab = int(r["slab"])
                        if slab not in by_slab:
                            continue
                        c = r.get("_chunk") or _TC(
                            r["postings"], r["skips"], r["block_max"]
                        )
                        local, _tf, _dl = c.decode_all(int(m["block_size"]))
                        gsets.setdefault(slab, []).append(local)
                per_group.append(gsets)
            from search_engine_spark.query.wand import _in_sorted

            inc_by_slab = {}
            for slab in list(by_slab):
                if not all(slab in g for g in per_group):
                    del by_slab[slab]  # some field value absent here
                    continue
                inc = np.unique(np.concatenate(per_group[0][slab]))
                for g in per_group[1:]:
                    s2 = np.unique(np.concatenate(g[slab]))
                    inc = inc[_in_sorted(inc, s2)]
                if len(inc) == 0:
                    del by_slab[slab]
                else:
                    inc_by_slab[slab] = inc
            if not by_slab:
                return []
        rngs = [
            r for r in (ranges or [])
            if r[1] is not None or r[2] is not None
        ]
        if rngs:
            import numpy as np

            from search_engine_spark.query.wand import _in_sorted

            ss = int(m["slab_size"])
            if inc_by_slab is None:
                inc_by_slab = {}
            for slab in list(by_slab):
                base = slab * ss
                mask = np.ones(ss, dtype=bool)
                for field, lo, hi in rngs:
                    vals = self._dv_slab_values(field, base, ss)
                    if lo is not None:
                        mask &= vals >= lo  # NaN (hole) fails
                    if hi is not None:
                        mask &= vals <= hi
                inc = np.flatnonzero(mask).astype(np.int64)
                prev = inc_by_slab.get(slab)
                if prev is not None:
                    inc = prev[_in_sorted(prev, inc)]
                if len(inc) == 0:
                    del by_slab[slab]
                    inc_by_slab.pop(slab, None)
                else:
                    inc_by_slab[slab] = inc
            if not by_slab:
                return []
        if (
            not exclude_terms and not tomb_local and not groups
            and not rngs and not n_req
        ):
            # pending deletes take the per-slab kernels (which accept
            # exclusion sets); a purging compaction restores the
            # fused fast path
            fused = self._fused_dense(by_term, by_slab, idf, k, after=after)
            if fused is not None:
                return fused
        bound_scale = max(1.0, float(m["avgdl"]) / float(m["norm_avgdl"]))

        def score_one(slab: int, rs: list):
            chunks = [
                (
                    r.get("_chunk")
                    or TermChunk(r["postings"], r["skips"], r["block_max"]),
                    idf[r["term"]],
                )
                for r in rs
            ]
            return slab_topk(
                chunks,
                slab * int(m["slab_size"]),
                int(m["slab_size"]),
                int(m["block_size"]),
                k,
                float(m["k1"]),
                float(m["b"]),
                float(m["avgdl"]),
                bound_scale,
                n_required=n_req,
                exclude=excl_by_slab.get(slab),
                after=after,
                include=(
                    inc_by_slab.get(slab) if inc_by_slab is not None
                    else None
                ),
            )

        results = self._run_slabs(by_slab, score_one)
        results.sort(key=lambda x: (-x[1], x[0]))
        return results[:k]

    def search_local_cached(
        self, query: str, k: int = 10, ttl_sec: float | None = None
    ) -> list[tuple[int, float]]:
        """``search_local`` behind the S8 result cache (SURVEY §2.1).

        The reference declares SearchCachePort.get/put(key, response,
        ttl) with key ``search:{q}:{page}:{size}:{sort}``
        (SE/application/search/port/output/SearchCachePort.java:10-45)
        but ships no adapter; this is that adapter for the serving
        tier (cache.SearchCache: TTL + LRU + hit/miss counters).  The
        cache lives one engine GENERATION: ``refresh()`` after any
        append/compact drops it, so staleness is bounded by both TTL
        and index generation.
        """
        from search_engine_spark.cache import SearchCache, search_key

        if self._result_cache is None:
            self._result_cache = SearchCache()
        key = search_key(query, 0, k, "score")
        hit = self._result_cache.get(key)
        if hit is not None:
            return list(hit)  # copy: caller mutation must not reach the cache
        res = self.search_local(query, k)
        self._result_cache.put(key, tuple(res), ttl_sec)
        return res

    def _local_vocab_df(self) -> dict[str, int]:
        """Full content-namespace {term: df} for the serving head's
        fuzzy/prefix expansion — the pyarrow analog of Lucene walking
        its term dictionary (FST).  One pass over the df table per
        engine generation; the df table is vocabulary-sized (not
        corpus-sized), the same data did_you_mean already slices."""
        if self._local_vocab is None:
            import pyarrow.dataset as ds

            from search_engine_spark.config import META_PREFIX, TITLE_PREFIX

            tab = ds.dataset(f"{self.index_dir}/df").to_table(
                columns=["term", "df"]
            )
            self._local_vocab = {
                t: int(d)
                for t, d in zip(
                    tab.column("term").to_pylist(),
                    tab.column("df").to_pylist(),
                )
                if not t.startswith(TITLE_PREFIX)
                and not t.startswith(META_PREFIX)
            }
        return self._local_vocab

    def search_local_fuzzy(
        self,
        query: str,
        k: int = 10,
        max_edits: int = 1,
        max_expansions: int = 50,
    ) -> list[tuple[int, float]]:
        """Serving twin of search_fuzzy — rank/score-identical by
        construction (same cap/order/boost via query/fuzzy.py's local
        twin, boosts merged in the same (qi, term) order)."""
        from search_engine_spark.query.fuzzy import fuzzy_expand_local

        terms = tokenize_query(query)
        if not terms:
            return []
        rows = sorted(
            (qi, term, boost)
            for qi, _qt, term, boost in fuzzy_expand_local(
                self._local_vocab_df(), terms, max_edits, max_expansions
            )
        )
        weights: dict[str, float] = {}
        for _qi, term, boost in rows:
            weights[term] = weights.get(term, 0.0) + boost
        return self._search_local_weights(weights, k)

    def search_local_prefix(
        self, prefix: str, k: int = 10, max_expansions: int = 50
    ) -> list[tuple[int, float]]:
        """Serving twin of search_prefix."""
        from search_engine_spark.query.fuzzy import prefix_expand_local

        weights = {
            t: 1.0
            for t in prefix_expand_local(
                self._local_vocab_df(), prefix, max_expansions
            )
        }
        return self._search_local_weights(weights, k)

    def search_local_fields(
        self, query: str, k: int = 10, expand: bool = False
    ) -> list[tuple[int, float]]:
        """Serving-path field-weighted top-k: NO Spark job — the same
        pruned pyarrow read + numpy WAND as ``search_local``, with
        per-chunk field statistics (title chunks score with the title
        field's idf/avgdl/bounds at their boosts).  Rank-identical to
        ``search_fields`` — same kernel, same tie-break."""
        import math as _math

        import pyarrow.dataset as ds

        from search_engine_spark.config import TITLE_PREFIX
        from search_engine_spark.indexer.codec import TermChunk
        from search_engine_spark.query.expansion import field_weights
        from search_engine_spark.query.wand import slab_topk

        m = self.meta
        if not m.get("index_title"):
            raise ValueError(
                "index was built with index_title=False; rebuild to use "
                "field-weighted search"
            )
        if self.store.kind != "parquet":
            raise NotImplementedError(
                "the no-Spark serving path reads parquet segment files "
                "directly; with a catalog store, serve via search_fields()"
            )
        fw = field_weights(query, expand=expand)
        if not fw:
            return []
        av_c, av_t = float(m["avgdl"]), float(m["avgdl_title"])
        bs_c = max(1.0, av_c / float(m["norm_avgdl"])) if av_c else 1.0
        bs_t = max(1.0, av_t / float(m["norm_avgdl_title"])) if av_t else 1.0
        # per namespaced term: (boost, field avgdl, field bound scale)
        info: dict[str, tuple[float, float, float]] = {}
        for t, w_c, w_t in fw:
            info[t] = (float(w_c), av_c, bs_c)
            info[TITLE_PREFIX + t] = (float(w_t), av_t, bs_t)
        terms = list(info)
        by_term = self._local_term_rows(terms)
        if not by_term:
            return []
        n, df_map = float(m["n_docs"]), self._local_df(terms)
        widf = {
            t: info[t][0]
            * _math.log(1.0 + (n - df_map[t] + 0.5) / (df_map[t] + 0.5))
            for t in terms
            if t in df_map
        }
        by_slab: dict[int, list] = {}
        for t, rows_t in by_term.items():
            if t in widf:
                for r in rows_t:
                    by_slab.setdefault(int(r["slab"]), []).append(r)
        def score_one(slab: int, rs: list):
            chunks = [
                (
                    r.get("_chunk")
                    or TermChunk(r["postings"], r["skips"], r["block_max"]),
                    widf[r["term"]],
                    info[r["term"]][1],
                    info[r["term"]][2],
                )
                for r in rs
            ]
            return slab_topk(
                chunks,
                slab * int(m["slab_size"]),
                int(m["slab_size"]),
                int(m["block_size"]),
                k,
                float(m["k1"]),
                float(m["b"]),
                av_c,
            )

        results = self._run_slabs(by_slab, score_one)
        results.sort(key=lambda x: (-x[1], x[0]))
        return results[:k]

    def search_local_advanced(
        self,
        query: str,
        k: int = 10,
        pagerank: dict[int, float] | None = None,
        missing: float = 0.0,
    ) -> list[tuple[int, float]]:
        """Serving-path composed query: NO Spark job — the same pruned
        pyarrow read as ``search_local`` feeding ``slab_topk_adv``
        (clause max-combine + per-doc log1p(2*pagerank) boost from a
        driver-resident pagerank dict).  Rank-identical to
        ``search_advanced`` (pinned in pytest)."""
        import math as _math

        import numpy as _np
        import pyarrow.dataset as ds

        from search_engine_spark.config import TITLE_PREFIX
        from search_engine_spark.indexer.codec import TermChunk
        from search_engine_spark.query.advanced import (
            FLD_CONTENT,
            PAGERANK_FACTOR,
            advanced_plan,
        )
        from search_engine_spark.query.wand import slab_topk_adv

        m = self.meta
        if not m.get("index_title"):
            raise ValueError(
                "index was built with index_title=False; rebuild to use "
                "the composed query"
            )
        if self.store.kind != "parquet":
            raise NotImplementedError(
                "the no-Spark serving path reads parquet segment files "
                "directly; with a catalog store, serve via search_advanced()"
            )
        plan = advanced_plan(query)
        if not plan:
            return []
        av_c, av_t = float(m["avgdl"]), float(m["avgdl_title"])
        bs_c = max(1.0, av_c / float(m["norm_avgdl"])) if av_c else 1.0
        bs_t = max(1.0, av_t / float(m["norm_avgdl_title"])) if av_t else 1.0
        # per namespaced term: list of (w, avgdl, bscale, clause, fld)
        info: dict[str, list[tuple]] = {}
        for clause, fld, t, w in plan:
            if fld == FLD_CONTENT:
                info.setdefault(t, []).append(
                    (float(w), av_c, bs_c, clause, 0)
                )
            else:
                info.setdefault(TITLE_PREFIX + t, []).append(
                    (float(w), av_t, bs_t, clause, 1)
                )
        terms = list(info)
        by_term = self._local_term_rows(terms)
        if not by_term:
            return []
        n, df_map = float(m["n_docs"]), self._local_df(terms)
        idf = {
            t: _math.log(1.0 + (n - df_map[t] + 0.5) / (df_map[t] + 0.5))
            for t in terms
            if t in df_map
        }
        by_slab: dict[int, list] = {}
        for t, rows_t in by_term.items():
            if t in idf:
                for r in rows_t:
                    by_slab.setdefault(int(r["slab"]), []).append(r)
        slab_size = int(m["slab_size"])
        use_boost = pagerank is not None
        pr_by_slab: dict[int, list[tuple[int, float]]] = {}
        if use_boost:
            # one pass over the dict, not one per candidate slab — at
            # 1M pagerank entries x 40 touched slabs the per-slab scan
            # would dwarf the pruned pyarrow read this path exists for
            for d, p in pagerank.items():
                pr_by_slab.setdefault(d // slab_size, []).append((d, p))
        def score_one(slab: int, rs: list):
            chunks = []
            for r in rs:
                c = r.get("_chunk") or TermChunk(
                    r["postings"], r["skips"], r["block_max"]
                )
                for w, avgdl_f, bsc, clause, fld in info[r["term"]]:
                    chunks.append(
                        (c, w * idf[r["term"]], avgdl_f, bsc, clause,
                         fld, -1)
                    )
            boost = None
            if use_boost:
                boost = _np.full(
                    slab_size,
                    _math.log1p(PAGERANK_FACTOR * missing),
                    dtype=_np.float64,
                )
                base = slab * slab_size
                for d, p in pr_by_slab.get(slab, ()):
                    boost[d - base] = _math.log1p(PAGERANK_FACTOR * p)
            return slab_topk_adv(
                chunks, slab * slab_size, slab_size,
                int(m["block_size"]), k, float(m["k1"]), float(m["b"]),
                boost=boost,
            )

        results = self._run_slabs(by_slab, score_one)
        results.sort(key=lambda x: (-x[1], x[0]))
        return results[:k]

    def _local_df(self, terms: list[str]) -> dict[str, int]:
        """Per-term global df for the serving path (cached)."""
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            import pyarrow.dataset as ds

            tab = ds.dataset(f"{self.index_dir}/df").to_table(
                filter=ds.field("term").isin(missing)
            )
            for t, d in zip(
                tab.column("term").to_pylist(), tab.column("df").to_pylist()
            ):
                self._df_cache[t] = int(d)
            for t in missing:
                self._df_cache.setdefault(t, 0)
        return {
            t: self._df_cache[t] for t in terms if self._df_cache.get(t, 0) > 0
        }

    def search_page(self, query: str, page: int = 0, size: int = 10) -> DataFrame:
        """W2 pagination: ES from/size semantics (page>=0, 1<=size<=100,
        Pagination.java:16-27; controller defaults page=0 size=10)."""
        page = max(0, int(page))
        size = min(max(1, int(size)), 100)
        from pyspark.sql import Window

        top = self.search(query, (page + 1) * size)
        w = Window.orderBy(F.desc("score"), F.asc("docid"))
        return (
            top.withColumn("rank", F.row_number().over(w))
            .filter(
                (F.col("rank") > page * size)
                & (F.col("rank") <= (page + 1) * size)
            )
        )

    def _decoded_postings_df(self, terms: list[str]) -> DataFrame:
        """(term, docid, tf) rows decoded from the pruned segment scan
        — one mapInPandas over the bucket/term/slab-pruned files,
        global docids.  The non-scoring decode shared by sortBy
        retrieval (and any future operator that needs the raw match
        set rather than a top-k)."""
        import pandas as pd

        from search_engine_spark.indexer.codec import TermChunk

        block_size = int(self.meta["block_size"])
        ss = int(self.meta["slab_size"])

        def gen(it):
            for pdf in it:
                for r in pdf.itertuples():
                    local, tf, _dl = TermChunk(
                        r.postings, r.skips, r.block_max
                    ).decode_all(block_size)
                    yield pd.DataFrame(
                        {
                            "term": r.term,
                            "docid": local + r.slab * ss,
                            "tf": tf.astype("int32"),
                        }
                    )

        seg = self._pruned_segments(terms).select(
            "slab", "term", "postings", "skips", "block_max"
        )
        return seg.mapInPandas(gen, schema="term string, docid long, tf int")

    def _admissible_docids(
        self,
        filters: "dict | None" = None,
        ranges: "list | None" = None,
    ) -> "DataFrame | None":
        """(docid) rows passing the keyword filters and doc-values
        ranges, as plain docmap predicates — the admissibility the
        kernel paths enforce via postings/raw-admission rows,
        recomputed as a column-pruned docmap scan for the paths that
        operate on candidate sets (search_sorted, the use-case
        facade).  Returns None when nothing is constrained."""
        if not filters and not ranges:
            return None
        adm = self.docmap
        cond = F.lit(True)
        for field, value in (filters or {}).items():
            vals = value if isinstance(value, (list, tuple)) else [value]
            cond = cond & F.col(field).isin([str(v) for v in vals])
        for fld, lo, hi in ranges or []:
            v = self._dv_value_col(fld)
            if lo is not None:
                cond = cond & (v >= float(lo))
            if hi is not None:
                cond = cond & (v <= float(hi))
        return adm.filter(cond).select(
            F.col("docid").cast("long").alias("docid")
        )

    def search_sorted(
        self,
        query: str,
        k: int = 10,
        sort_by: str = "date",
        rank: DataFrame | None = None,
        filter: "dict | None" = None,
        date_from: "str | int | None" = None,
        date_to: "str | int | None" = None,
        min_quality: float | None = None,
    ) -> DataFrame:
        """SearchRequestDTO ``sortBy`` semantics (relevance | date |
        pagerank — SearchRequestDTO.java:19, SearchControllerV2.java:46;
        the reference's ES adapter plumbs the param but its Spring Data
        findAll never applies it, SURVEY §2.1 S6): documents matching
        ANY query term, top-k by the sort key desc (docid asc tie)
        instead of score; each hit still carries its BM25 score.

        Keys: ``date`` = the deterministic synthetic publish day
        (ops/ranking.pub_day_col — the corpus has no real dates);
        ``pagerank`` = the supplied ``rank`` DataFrame (docid, rank),
        e.g. ops/graph.pagerank_converged output, missing docs at 0.0;
        with ``rank=None`` the deterministic hash rank stands in.

        Plan shape (the 100 TB story): pruned segment scan -> decode
        to (docid) -> distinct (one shuffle on docid) -> TakeOrdered k
        by key (per-partition top-k + driver merge, no global sort) ->
        BM25 scores computed for the k SURVIVORS ONLY (a second pruned
        scan filtered to k docids + broadcast idf + docmap doclen for
        k rows).  Sorting by a field never scores the full match set.
        """
        if sort_by in ("relevance", "score"):
            return self.search(
                query, k, filter=filter, date_from=date_from,
                date_to=date_to, min_quality=min_quality,
            )
        if sort_by not in ("date", "pagerank"):
            raise ValueError(f"unknown sortBy {sort_by!r}")
        from search_engine_spark.ops.ranking import (
            hash_rank_col,
            pub_day_col,
        )

        empty = "docid long, sort_key double, score double"
        terms = tokenize_query(query)
        if not terms:
            return self.spark.createDataFrame([], empty)
        dec = self._drop_tombstones(self._decoded_postings_df(terms))
        cand = dec.select("docid").distinct()
        adm = self._admissible_docids(
            filter, _dto_ranges(date_from, date_to, min_quality)
        )
        if adm is not None:
            # filters apply BEFORE the top-k by sort key (exact —
            # a filtered sort is the sort of the filtered set)
            cand = cand.join(adm, "docid", "left_semi")
        if sort_by == "date":
            keyed = cand.withColumn(
                "sort_key", pub_day_col(F.col("docid")).cast("double")
            )
        elif rank is None:
            keyed = cand.withColumn("sort_key", hash_rank_col(F.col("docid")))
        else:
            r = rank.select(
                F.col(rank.columns[0]).cast("long").alias("docid"),
                F.col(rank.columns[1]).cast("double").alias("sort_key"),
            )
            keyed = cand.join(r, "docid", "left").fillna({"sort_key": 0.0})
        top = keyed.orderBy(F.desc("sort_key"), F.asc("docid")).limit(k)
        surv = [int(r["docid"]) for r in top.collect()]  # the k results
        if not surv:
            return self.spark.createDataFrame([], empty)
        m = self.meta
        k1, b = float(m["k1"]), float(m["b"])
        avgdl = float(m["avgdl"])
        dl = self.docmap.filter(F.col("docid").isin(surv)).select(
            "docid", "doclen"
        )
        tfd = F.col("tf").cast("double")
        scores = (
            dec.filter(F.col("docid").isin(surv))
            .join(F.broadcast(self._idf_rows(terms)), "term")
            .join(F.broadcast(dl), "docid")
            .withColumn(
                "_c",
                F.col("idf")
                * tfd * (k1 + 1.0)
                / (tfd + k1 * (1.0 - b + b * F.col("doclen") / avgdl)),
            )
            .groupBy("docid")
            .agg(F.sum("_c").alias("score"))
        )
        return (
            top.join(scores, "docid")
            .select("docid", "sort_key", "score")
            .orderBy(F.desc("sort_key"), F.asc("docid"))
        )

    def facet_counts(
        self, query: str, field: str = "lang", size: int = 10
    ) -> DataFrame:
        """ES terms-aggregation over the match set (the `aggs` half of
        a search request — search hits page, facets summarize): docs
        matching ANY query term, counted per docmap ``field`` value,
        top ``size`` buckets by (count desc, value asc).

        Plan shape: pruned segment scan -> decode docids -> distinct
        (one shuffle) -> broadcast-side join against the docmap
        projection of (docid, field) -> partial-aggregated count ->
        TakeOrdered.  The aggregation never touches content — only
        the two projected columns — so at 100 TB it is a counted
        semi-join, not a document scan.  Tombstoned docs are excluded
        (facets over deleted docs would leak them back).
        """
        terms = tokenize_query(query)
        empty = f"{field} string, cnt long"
        if not terms:
            return self.spark.createDataFrame([], empty)
        cand = self._drop_tombstones(
            self._decoded_postings_df(terms).select("docid").distinct()
        )
        return (
            cand.join(self.docmap.select("docid", field), "docid")
            .groupBy(field)
            .agg(F.count("*").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc(field))
            .limit(size)
        )

    def facet_counts_local(
        self, query: str, field: str = "lang", size: int = 10
    ) -> list[tuple[str, int]]:
        """Serving twin of ``facet_counts`` (no Spark job): pruned
        pyarrow chunk read -> union of decoded docids -> gather the
        per-generation field array -> value counts.  Identical
        buckets/counts to the Spark path (pure integer counting)."""
        import numpy as np

        from search_engine_spark.indexer.codec import TermChunk

        terms = list(dict.fromkeys(tokenize_query(query)))
        if not terms:
            return []
        by_term = self._local_term_rows(terms)
        if not by_term:
            return []
        m = self.meta
        ss, bs = int(m["slab_size"]), int(m["block_size"])
        parts = []
        for rows_t in by_term.values():
            for r in rows_t:
                c = r.get("_chunk") or TermChunk(
                    r["postings"], r["skips"], r["block_max"]
                )
                local, _tf, _dl = c.decode_all(bs)
                parts.append(local + int(r["slab"]) * ss)
        ids = np.unique(np.concatenate(parts))
        tomb = self._tombstones_arr()
        if tomb is not None and len(ids):
            from search_engine_spark.query.wand import _not_in_sorted

            ids = ids[_not_in_sorted(ids, tomb)]
        vals = self._field_all(field)[ids]
        uniq, cnt = np.unique(vals, return_counts=True)
        order = np.lexsort((uniq, -cnt))[:size]
        return [(str(uniq[i]), int(cnt[i])) for i in order]

    def _dv_slab_values(self, field: str, base: int, n: int):
        """Serving-tier doc values for one slab: float64 array of
        ``field`` for global docids [base, base+n).  ``day`` is the
        deterministic publish-day function of docid (no IO);
        ``quality`` gathers from a per-generation float64 array built
        from one column-pruned pyarrow docmap read (docid + quality
        only), NaN at holes (purged / never-assigned docids) so range
        predicates exclude them."""
        import numpy as np

        if field == "day":
            from search_engine_spark.ops.ranking import PUBLISH_RANGE_DAYS

            g = base + np.arange(n, dtype=np.int64)
            return ((g * 16807) % PUBLISH_RANGE_DAYS).astype(np.float64)
        if field != "quality":
            raise ValueError(f"unknown range field {field!r}")
        arr = self._dv_arrs.get("quality")
        if arr is None:
            import pyarrow.dataset as ds

            dset = ds.dataset(
                f"{self.index_dir}/docmap", partitioning="hive"
            )
            if "quality" in dset.schema.names:
                tab = dset.to_table(columns=["docid", "quality"])
                qvals = tab.column("quality").to_numpy(
                    zero_copy_only=False
                )
            else:
                # pre-quality-column docmap (legacy index): compute
                # the F13 formula here once per generation via the
                # shared python twin (same IEEE op order as the
                # materialized column)
                from search_engine_spark.ops.ranking import quality_py

                tab = dset.to_table(columns=["docid", "content"])
                qvals = np.array(
                    [
                        quality_py(c)
                        for c in tab.column("content").to_pylist()
                    ]
                )
            ids = tab.column("docid").to_numpy()
            arr = np.full(
                (int(ids.max()) + 1) if len(ids) else 0, np.nan
            )
            arr[ids] = qvals
            self._dv_arrs["quality"] = arr
        out = np.full(n, np.nan)
        end = min(base + n, len(arr))
        if end > base:
            out[: end - base] = arr[base:end]
        return out

    def _field_all(self, field: str):
        """Per-generation object array docid -> docmap[field] for the
        serving tier (pyarrow read, cached per field)."""
        cache = self._field_arrs
        if field not in cache:
            import numpy as np
            import pyarrow.dataset as ds

            tab = ds.dataset(
                f"{self.index_dir}/docmap", partitioning="hive"
            ).to_table(columns=["docid", field])
            ids = tab.column("docid").to_numpy()
            arr = np.empty(int(ids.max()) + 1, dtype=object)
            arr[ids] = tab.column(field).to_pylist()
            cache[field] = arr
        return cache[field]

    def mlt_weights(
        self, docid: int, max_terms: int = 25
    ) -> dict[str, float]:
        """more_like_this term selection (the ES MLT rule): the source
        document's terms ranked by tf·idf, top ``max_terms`` (tie:
        term asc), each becoming a plain should-clause at weight 1.0.
        Deterministic — the same selection the serving twin and the
        contract oracle compute."""
        import math as _math

        from search_engine_spark.tokenizer import py_tokenize

        rows = (
            self.docmap.filter(F.col("docid") == int(docid))
            .select("content")
            .collect()
        )
        if not rows:
            raise KeyError(f"docid {docid} not in docmap")
        toks = py_tokenize(rows[0]["content"])
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        df_map = self._local_df(list(tf)) if (
            self.store.kind == "parquet"
        ) else {
            r["term"]: int(r["df"])
            for r in self.df_table.filter(
                F.col("term").isin(list(tf))
            ).collect()
        }
        n = float(self.meta["n_docs"])
        scored = [
            (
                tf[t] * _math.log(1.0 + (n - df_map[t] + 0.5) / (df_map[t] + 0.5)),
                t,
            )
            for t in tf
            if t in df_map
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        return {t: 1.0 for _, t in scored[:max_terms]}

    def more_like_this(
        self, docid: int, k: int = 10, max_terms: int = 25
    ) -> DataFrame:
        """ES more_like_this: find documents similar to ``docid`` —
        its top tf·idf terms become a bool.should BM25 query; the
        source document itself is excluded from the results (fetch
        k+1, drop, cut — exact)."""
        w = self.mlt_weights(docid, max_terms)
        if not w:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        top = self._search_weights(w, k + 1)
        return (
            top.filter(F.col("docid") != int(docid))
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    def more_like_this_local(
        self, docid: int, k: int = 10, max_terms: int = 25
    ) -> list[tuple[int, float]]:
        """Serving twin of ``more_like_this`` (no Spark job for the
        search; the term selection reads one docmap row)."""
        import pyarrow.dataset as ds

        tab = ds.dataset(
            f"{self.index_dir}/docmap", partitioning="hive"
        ).to_table(
            filter=ds.field("docid") == int(docid), columns=["content"]
        )
        if tab.num_rows == 0:
            raise KeyError(f"docid {docid} not in docmap")
        import math as _math

        from search_engine_spark.tokenizer import py_tokenize

        toks = py_tokenize(tab.column("content").to_pylist()[0])
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        df_map = self._local_df(list(tf))
        n = float(self.meta["n_docs"])
        scored = [
            (
                tf[t] * _math.log(1.0 + (n - df_map[t] + 0.5) / (df_map[t] + 0.5)),
                t,
            )
            for t in tf
            if t in df_map
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        w = {t: 1.0 for _, t in scored[:max_terms]}
        if not w:
            return []
        res = self._search_local_weights(w, k + 1)
        return [(d, s) for d, s in res if d != int(docid)][:k]

    def explain(self, query: str, docid: int) -> DataFrame:
        """ES ``explain`` API: why does ``docid`` score what it scores
        for ``query``?  One row per matching query term — (term, tf,
        df, idf, tfn, contribution) — whose contributions sum to the
        document's ``search()`` score (pinned in pytest).

        Plan shape: the pruned segment scan narrows to the terms'
        buckets AND the document's single slab (docid // slab_size)
        before any decode, so an explain costs one slab's chunks for
        the query terms — O(query df within one slab), independent of
        corpus size."""
        terms = tokenize_query(query)
        empty = (
            "term string, tf int, df long, idf double, tfn double, "
            "contribution double"
        )
        if not terms:
            return self.spark.createDataFrame([], empty)
        m = self.meta
        ss = int(m["slab_size"])
        slab = int(docid) // ss
        k1, b = float(m["k1"]), float(m["b"])
        avgdl = float(m["avgdl"])
        dec = (
            self._decoded_postings_df_sl(terms, slab)
            .filter(F.col("docid") == int(docid))
        )
        dl = self.docmap.filter(F.col("docid") == int(docid)).select(
            F.col("doclen").cast("double").alias("dl")
        )
        tfd = F.col("tf").cast("double")
        tfn = tfd * (k1 + 1.0) / (
            tfd + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        )
        return (
            dec.join(
                F.broadcast(
                    self.df_table.filter(F.col("term").isin(terms))
                ),
                "term",
            )
            .crossJoin(F.broadcast(dl))
            .withColumn(
                "idf",
                F.log1p(
                    (F.lit(float(m["n_docs"])) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
            )
            .withColumn("tfn", tfn)
            .withColumn("contribution", F.col("idf") * F.col("tfn"))
            .select("term", "tf", "df", "idf", "tfn", "contribution")
            .orderBy(F.desc("contribution"), F.asc("term"))
        )

    def _decoded_postings_df_sl(
        self, terms: list[str], slab: int
    ) -> DataFrame:
        """Single-slab variant of ``_decoded_postings_df`` — adds the
        slab partition predicate so only that slab's files list."""
        import pandas as pd

        from search_engine_spark.indexer.codec import TermChunk

        block_size = int(self.meta["block_size"])
        ss = int(self.meta["slab_size"])

        def gen(it):
            for pdf in it:
                for r in pdf.itertuples():
                    local, tf, _dl = TermChunk(
                        r.postings, r.skips, r.block_max
                    ).decode_all(block_size)
                    yield pd.DataFrame(
                        {
                            "term": r.term,
                            "docid": local + r.slab * ss,
                            "tf": tf.astype("int32"),
                        }
                    )

        seg = (
            self._pruned_segments(terms)
            .filter(F.col("slab") == int(slab))
            .select("slab", "term", "postings", "skips", "block_max")
        )
        return seg.mapInPandas(gen, schema="term string, docid long, tf int")

    def explain_local(
        self, query: str, docid: int
    ) -> list[tuple[str, int, int, float, float, float]]:
        """Serving twin of ``explain`` (no Spark job): same rows,
        same floats to 1e-12."""
        import math as _math

        from search_engine_spark.indexer.codec import TermChunk

        terms = list(dict.fromkeys(tokenize_query(query)))
        if not terms:
            return []
        m = self.meta
        ss, bs = int(m["slab_size"]), int(m["block_size"])
        slab = int(docid) // ss
        by_term = self._local_term_rows(terms)
        n = float(m["n_docs"])
        k1, b, avgdl = float(m["k1"]), float(m["b"]), float(m["avgdl"])
        df_map = self._local_df(terms)
        dl = float(self._doclen_all()[int(docid)])
        out = []
        for t, rows_t in by_term.items():
            if t not in df_map:
                continue
            tf = 0
            for r in rows_t:
                if int(r["slab"]) != slab:
                    continue
                c = r.get("_chunk") or TermChunk(
                    r["postings"], r["skips"], r["block_max"]
                )
                local, tfs, _dls = c.decode_all(bs)
                import numpy as np

                pos = np.searchsorted(local, int(docid) - slab * ss)
                if pos < len(local) and local[pos] == int(docid) - slab * ss:
                    tf = int(tfs[pos])
                    break
            if tf == 0:
                continue
            df = df_map[t]
            idf = _math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tfn = tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
            out.append((t, tf, df, idf, tfn, idf * tfn))
        out.sort(key=lambda x: (-x[5], x[0]))
        return out

    def stats(self) -> dict:
        """ES `_cat/indices` / `_stats` analog: one dict of
        index-level facts — live vs raw doc counts, pending
        tombstones, LSM generation depth, per-namespace vocabulary
        sizes (content / `t#` title / `m#` metadata), segment chunk
        count and posting bytes, slab count, and positional-index
        state.  Two small aggregate jobs (segments projected to three
        columns, df projected to one) — nothing decodes."""
        from search_engine_spark.config import META_PREFIX, TITLE_PREFIX

        m = self.meta
        seg = self.segments.agg(
            F.count("*").alias("chunks"),
            F.sum(F.length("postings")).alias("posting_bytes"),
            F.countDistinct("slab").alias("slabs_used"),
            F.max("gen").alias("max_gen_seen"),
        ).collect()[0]
        ns = (
            self.df_table.select(
                F.when(
                    F.col("term").startswith(TITLE_PREFIX), "title"
                )
                .when(F.col("term").startswith(META_PREFIX), "meta")
                .otherwise("content")
                .alias("ns")
            )
            .groupBy("ns")
            .count()
            .collect()
        )
        vocab = {r["ns"]: int(r["count"]) for r in ns}
        n_tomb = self._n_tomb()
        pos_state = "absent"
        if self.store.exists("pos_meta", self.spark):
            row = self.store.read(self.spark, "pos_meta").collect()[0]
            pos_state = (
                "current"
                if int(row["n_docs"]) == int(m["n_docs"])
                else "stale"
            )
        return {
            "n_docs_live": int(m["n_docs"]) - n_tomb,
            "n_docs": int(m["n_docs"]),
            "pending_deletes": n_tomb,
            "next_docid": int(m.get("next_docid", m["n_docs"])),
            "n_slabs": int(m["n_slabs"]),
            "slabs_used": int(seg["slabs_used"]),
            "max_gen": int(m.get("max_gen", 0)),
            "max_gen_seen": int(seg["max_gen_seen"] or 0),
            "segment_chunks": int(seg["chunks"]),
            "posting_bytes": int(seg["posting_bytes"] or 0),
            "vocab_content": vocab.get("content", 0),
            "vocab_title": vocab.get("title", 0),
            "vocab_meta": vocab.get("meta", 0),
            "avgdl": float(m["avgdl"]),
            "norm_avgdl": float(m["norm_avgdl"]),
            "index_fields": list(m.get("index_fields", [])),
            "positional_index": pos_state,
        }

    def _doclen_all(self):
        """Per-generation int32 doclen array indexed by docid — the
        serving tier's norms table (pyarrow read, cached)."""
        if self._doclen_arr is None:
            import numpy as np
            import pyarrow.dataset as ds

            tab = ds.dataset(
                f"{self.index_dir}/docmap", partitioning="hive"
            ).to_table(columns=["docid", "doclen"])
            ids = tab.column("docid").to_numpy()
            arr = np.zeros(int(ids.max()) + 1, dtype=np.int32)
            arr[ids] = tab.column("doclen").to_numpy()
            self._doclen_arr = arr
        return self._doclen_arr

    def search_local_sorted(
        self,
        query: str,
        k: int = 10,
        sort_by: str = "date",
        rank: "dict[int, float] | None" = None,
    ) -> list[tuple[int, float, float]]:
        """Serving twin of ``search_sorted`` (no Spark job): pruned
        pyarrow chunk read -> union of decoded docids -> vectorized
        key -> top-k by (key desc, docid asc) -> BM25 for survivors
        from the already-decoded tfs + the doclen array.  Returns
        [(docid, sort_key, score)]; rank-identical to the Spark path
        (same integer keys), scores agree to float tolerance."""
        import math as _math

        import numpy as np

        from search_engine_spark.indexer.codec import (
            TermChunk,
            tf_norm_factor,
        )
        from search_engine_spark.ops.ranking import (
            PUBLISH_RANGE_DAYS,
            RANK_MOD,
        )

        if sort_by in ("relevance", "score"):
            return [
                (d, s, s) for d, s in self.search_local(query, k)
            ]
        if sort_by not in ("date", "pagerank"):
            raise ValueError(f"unknown sortBy {sort_by!r}")
        terms = list(dict.fromkeys(tokenize_query(query)))
        if not terms:
            return []
        m = self.meta
        by_term = self._local_term_rows(terms)
        if not by_term:
            return []
        ss, bs = int(m["slab_size"]), int(m["block_size"])
        decoded: dict[str, list] = {}
        for t, rows_t in by_term.items():
            parts = []
            for r in rows_t:
                c = r.get("_chunk") or TermChunk(
                    r["postings"], r["skips"], r["block_max"]
                )
                local, tf, _dl = c.decode_all(bs)
                parts.append((local + int(r["slab"]) * ss, tf))
            decoded[t] = parts
        all_ids = np.unique(
            np.concatenate(
                [g for ps in decoded.values() for g, _ in ps]
            )
        )
        tomb = self._tombstones_arr()
        if tomb is not None and len(all_ids):
            from search_engine_spark.query.wand import _not_in_sorted

            all_ids = all_ids[_not_in_sorted(all_ids, tomb)]
        if sort_by == "date":
            key = ((all_ids * 16807) % PUBLISH_RANGE_DAYS).astype(
                np.float64
            )
        elif rank is None:
            key = (
                (all_ids * 2654435761) % RANK_MOD
            ).astype(np.float64) / float(RANK_MOD)
        else:
            key = np.array(
                [float(rank.get(int(d), 0.0)) for d in all_ids]
            )
        order = np.lexsort((all_ids, -key))[:k]
        surv, skey = all_ids[order], key[order]
        n, df_map = float(m["n_docs"]), self._local_df(terms)
        k1, b, avgdl = float(m["k1"]), float(m["b"]), float(m["avgdl"])
        dlall = self._doclen_all()
        score = np.zeros(len(surv), dtype=np.float64)
        for t in terms:
            if t not in df_map:
                continue
            idf = _math.log(1.0 + (n - df_map[t] + 0.5) / (df_map[t] + 0.5))
            for gids, tf in decoded[t]:
                pos = np.searchsorted(gids, surv)
                pos[pos >= len(gids)] = len(gids) - 1
                hit = gids[pos] == surv
                if not hit.any():
                    continue
                tfv = tf[pos[hit]].astype(np.float64)
                dlv = dlall[surv[hit]].astype(np.float64)
                score[hit] += idf * tf_norm_factor(tfv, dlv, k1, b, avgdl)
        return [
            (int(d), float(kk), float(s))
            for d, kk, s in zip(surv, skey, score)
        ]

    def _count_single_term_fast(self, term: str) -> int:
        """Single-term A7 fast path: the (term, slab) inventory's df
        column already counts distinct matching docs per slab
        (generation chunks within a slab cover disjoint docid ranges),
        so the count is a driver-side pyarrow sum over the tiny
        inventory — O(slabs the term occurs in), zero postings
        decode."""
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        tab = ds.dataset(f"{self.index_dir}/term_slabs").to_table(
            filter=ds.field("term") == term, columns=["df"]
        )
        return int(pc.sum(tab.column("df")).as_py() or 0)

    def count_matches(self, query: str) -> int:
        """A7 totalResults: exact count of docs matching >= 1 term.

        Per-slab union of decoded posting docids (no scoring), summed;
        slabs are disjoint docid ranges so the global count is the sum.
        """
        terms = tokenize_query(query)
        if not terms:
            return 0
        tomb = self._tombstones_arr()
        if (
            len(terms) == 1
            and self._term_slab_cache is not None
            and tomb is None  # pending deletes need the decode path
        ):
            # Multi-term OR keeps the decode below (union semantics
            # need the actual docids).
            return self._count_single_term_fast(terms[0])
        import pandas as pd

        from search_engine_spark.indexer.codec import TermChunk

        block_size = int(self.meta["block_size"])
        ss = int(self.meta["slab_size"])

        def count_group(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            slab = int(pdf["slab"].iloc[0])
            ids = [
                TermChunk(r.postings, r.skips, r.block_max).decode_all(
                    block_size
                )[0]
                for r in pdf.itertuples()
            ]
            if not ids:
                return pd.DataFrame({"n": [0]})
            u = np.unique(np.concatenate(ids))
            if tomb is not None and len(u):
                g = u + slab * ss
                pos = np.searchsorted(tomb, g)
                pos[pos >= len(tomb)] = len(tomb) - 1
                u = u[tomb[pos] != g]
            return pd.DataFrame({"n": [len(u)]})

        seg = self._pruned_segments(terms).select(
            "slab", "postings", "skips", "block_max"
        )
        per = seg.groupBy("slab").applyInPandas(count_group, schema="n long")
        row = per.agg(F.sum("n").alias("total")).collect()[0]
        return int(row["total"] or 0)

    def count_matches_local(self, query: str) -> int:
        """Serving twin of ``count_matches`` (no Spark job): the same
        single-term inventory fast path; multi-term via the pruned
        pyarrow chunk reads and per-slab docid unions the facet and
        WAND serving heads already use.  Exact — pinned equal to the
        Spark path in pytest."""
        import numpy as np

        from search_engine_spark.indexer.codec import TermChunk

        terms = list(dict.fromkeys(tokenize_query(query)))
        if not terms:
            return 0
        tomb = self._tombstones_arr()
        if (
            len(terms) == 1
            and self._term_slab_cache is not None
            and tomb is None
        ):
            return self._count_single_term_fast(terms[0])
        rows = self._local_term_rows(terms)
        bs = int(self.meta["block_size"])
        ss = int(self.meta["slab_size"])
        by_slab: dict[int, list] = {}
        for rows_t in rows.values():
            for r in rows_t:
                c = r.get("_chunk") or TermChunk(
                    r["postings"], r["skips"], r["block_max"]
                )
                by_slab.setdefault(int(r["slab"]), []).append(
                    c.decode_all(bs)[0]
                )
        total = 0
        for slab, parts in by_slab.items():
            u = np.unique(np.concatenate(parts))
            if tomb is not None and len(u):
                from search_engine_spark.query.wand import _not_in_sorted

                u = u[_not_in_sorted(u + slab * ss, tomb)]
            total += len(u)
        return total

    # -- phrase retrieval (positional segments) ---------------------------
    def build_positions(self, use_arrow_udf: bool = True) -> dict:
        """Opt into phrase support: build the positional segments
        (Lucene-.pos analog, indexer/positions.py) for the current
        corpus.  Must be re-run after append/compact — search_phrase
        refuses a stale positional index."""
        from search_engine_spark.indexer.positions import (
            build_positional_index,
        )

        m = build_positional_index(self.spark, self.index_dir, use_arrow_udf)
        self._possegments = None
        self._pos_ok = None
        self._pos_local_ds = None
        return m

    def _phrase_ready(self) -> None:
        if self._pos_ok is None:
            if not self.store.exists("pos_meta", self.spark):
                self._pos_ok = False
            else:
                row = self.store.read(self.spark, "pos_meta").collect()[0]
                self._pos_ok = int(row["n_docs"]) == int(self.meta["n_docs"])
        if not self._pos_ok:
            raise RuntimeError(
                "positional index missing or stale for this corpus "
                "generation — run engine.build_positions() first "
                "(appends/compactions invalidate it, the same rule as "
                "Lucene merges rewriting .pos)"
            )

    def search_phrase(
        self, phrase: str, k: int = 10, slop: int = 0
    ) -> DataFrame:
        """ES match_phrase analog over the positional segments: exact
        adjacent-run occurrences scored as a single BM25 pseudo-term
        (tf = occurrence count, df = matching-doc count).  ``slop > 0``
        relaxes adjacency to an in-order proximity chain (Lucene
        SpanNearQuery inOrder=true analog — total gap <= slop; see
        positions.make_phrase_matcher); slab pruning is unchanged (a
        near match still needs every term in the doc's slab).

        Plan shape (same as the BM25 WAND path's): possegments scan
        pruned to files that can match (bucket file-skip + term row
        filter + INTERSECTION of the query terms' slab inventories —
        a phrase doc must hold every term, so only slabs common to
        all terms can match) -> groupBy(slab).applyInPandas with an
        all-numpy composite-key position intersection
        (positions.make_phrase_matcher; only COMPRESSED chunks
        shuffle, never decoded position lists) -> doclen join on the
        surviving candidates only -> BM25 -> TakeOrdered.  Position
        work is slab-local and proportional to the query terms'
        occurrence counts, never the corpus.
        """
        from search_engine_spark.indexer.positions import (
            make_phrase_matcher,
        )
        from search_engine_spark.indexer.segments import term_bucket_py
        from search_engine_spark.tokenizer import py_tokenize

        terms = py_tokenize(" ".join(phrase.strip().split())[:500])
        if not terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        self._phrase_ready()
        m = self.meta
        if self._possegments is None:
            self.store.refresh(self.spark, "possegments")
            self._possegments = self.store.read(self.spark, "possegments")
        buckets = sorted(
            {term_bucket_py(t, int(m["term_buckets"])) for t in terms}
        )
        pred = F.col("bucket").isin(buckets) & F.col("term").isin(
            list(set(terms))
        )
        # slab pruning: intersect per-term slab sets (phrase = AND)
        if self._term_slab_cache is not None:
            self._slabs_for(terms)  # prime the per-term cache
            slabs = None
            for t in terms:
                s = self._term_slab_cache[t]
                slabs = s if slabs is None else (slabs & s)
            if not slabs:
                return self.spark.createDataFrame([], TOPK_SCHEMA)
            pred = pred & F.col("slab").isin(sorted(slabs))
        matches = (
            self._possegments.filter(pred)
            .groupBy("slab")
            .applyInPandas(
                make_phrase_matcher(terms, int(m["slab_size"]), slop),
                schema="docid long, ptf long",
            )
        )
        # df is a scalar the score needs on every row; materializing
        # matches once (persist + count) instead of crossJoin-ing an
        # aggregate of the same plan halves the kernel executions —
        # the previous query's candidate set is dropped here, the
        # current one at the next call or refresh()
        if self._phrase_matches is not None:
            self._phrase_matches.unpersist()
        matches = self._drop_tombstones(matches).persist()
        self._phrase_matches = matches
        dfv = float(matches.count())
        if dfv == 0.0:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        n, k1, b = float(m["n_docs"]), float(m["k1"]), float(m["b"])
        avgdl = float(m["avgdl"])
        tfd = F.col("ptf").cast("double")
        scored = (
            matches.join(self.docmap.select("docid", "doclen"), "docid")
            .withColumn(
                "score",
                F.lit(math.log1p((n - dfv + 0.5) / (dfv + 0.5)))
                * (
                    tfd
                    * (k1 + 1.0)
                    / (
                        tfd
                        + k1 * (1.0 - b + b * F.col("doclen") / F.lit(avgdl))
                    )
                ),
            )
        )
        return (
            scored.orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
            .select("docid", "score")
        )

    def search_phrase_local(
        self, phrase: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Serving-path phrase top-k: NO Spark job — pyarrow pruned
        read of the positional chunks + the same numpy composite-key
        kernel per slab, merged on the driver.  Rank- and
        score-identical to ``search_phrase()`` (same chunks, same
        kernel, same tie-break; asserted in tests) — the phrase
        analog of ``search_local``.

        Doc lengths come from a per-generation int32 array loaded
        once from docmap (4 B/doc: ~40 MB at 10M docs, the same
        order as the serving caches' byte budgets).
        """
        import numpy as np
        import pyarrow.dataset as ds

        from search_engine_spark.indexer.positions import (
            make_phrase_matcher,
        )
        from search_engine_spark.indexer.segments import term_bucket_py
        from search_engine_spark.query.wand import _topk_select
        from search_engine_spark.tokenizer import py_tokenize

        terms = py_tokenize(" ".join(phrase.strip().split())[:500])
        if not terms:
            return []
        self._phrase_ready()
        if self.store.kind != "parquet":
            raise NotImplementedError(
                "the no-Spark serving path reads parquet segment files "
                "directly; with a catalog store, serve via "
                "search_phrase()"
            )
        m = self.meta
        slabs = None
        if self._term_slab_cache is not None:
            self._slabs_for(terms)
            for t in terms:
                s = self._term_slab_cache[t]
                slabs = s if slabs is None else (slabs & s)
            if not slabs:
                return []
        if self._pos_local_ds is None:
            self._pos_local_ds = ds.dataset(
                f"{self.index_dir}/possegments", partitioning="hive"
            )
        buckets = sorted(
            {term_bucket_py(t, int(m["term_buckets"])) for t in terms}
        )
        flt = ds.field("term").isin(list(set(terms))) & ds.field(
            "bucket"
        ).isin(buckets)
        if slabs is not None:
            flt = flt & ds.field("slab").isin(sorted(slabs))
        pdf = self._pos_local_ds.to_table(
            filter=flt, columns=["slab", "term", "posdata"]
        ).to_pandas()
        if pdf.empty:
            return []
        kernel = make_phrase_matcher(terms, int(m["slab_size"]), slop)
        parts = [
            kernel((int(slab),), g) for slab, g in pdf.groupby("slab")
        ]
        docids = np.concatenate([p["docid"].to_numpy() for p in parts])
        ptf = np.concatenate(
            [p["ptf"].to_numpy() for p in parts]
        ).astype(np.float64)
        tomb = self._tombstones_arr()
        if tomb is not None and docids.size:
            from search_engine_spark.query.wand import _not_in_sorted

            keep = _not_in_sorted(docids, tomb)
            docids, ptf = docids[keep], ptf[keep]
        if docids.size == 0:
            return []
        dl = self._doclen_all()[docids].astype(np.float64)
        n, k1, b = float(m["n_docs"]), float(m["k1"]), float(m["b"])
        avgdl = float(m["avgdl"])
        dfv = float(docids.size)
        idf = math.log1p((n - dfv + 0.5) / (dfv + 0.5))
        sc = idf * (
            ptf * (k1 + 1.0) / (ptf + k1 * (1.0 - b + b * dl / avgdl))
        )
        ids_k, sc_k = _topk_select(docids, sc, k)
        return [(int(d), float(s)) for d, s in zip(ids_k, sc_k)]

    def search_ranked(
        self,
        query: str,
        k: int = 10,
        pagerank: DataFrame | None = None,
        per_repo: int = 2,
        expand: bool = False,
    ) -> DataFrame:
        """ML-blended, diversified results (reference X7/X9/W5).

        candidates (4k by BM25) -> min-max-normalized bm25 + content
        quality (F13) + optional pagerank (node, pagerank in [0,1])
        -> 0.35/0.25/0.20/0.15/0.05 blend -> max `per_repo` per repo
        -> top-k.  CTR and freshness default to 0 (no click logs or
        crawl timestamps in the corpus schema).
        """
        from search_engine_spark.ops.ranking import (
            diversify,
            ml_blend_col,
            quality_col,
        )
        from search_engine_spark.tokenizer import tokens_col

        cand = self.search(query, 4 * k, expand=expand)
        # broadcast the tiny candidate set; never shuffle the docmap.
        # quality is materialized into the docmap at build/append time
        # (a static per-doc property — no query-time re-tokenization);
        # pre-quality-column docmaps fall back to computing it here.
        joined = self.docmap.join(F.broadcast(cand), "docid")
        if "quality" not in self.docmap.columns:
            joined = joined.withColumn(
                "quality", quality_col(F.col("content"),
                                       tokens_col("content"))
            )
        mx = joined.agg(F.max("score").alias("_mx"))
        joined = joined.crossJoin(F.broadcast(mx)).withColumn(
            "bm25norm",
            F.when(F.col("_mx") > 0, F.col("score") / F.col("_mx")).otherwise(
                F.lit(0.0)
            ),
        )
        if pagerank is not None:
            joined = joined.join(
                F.broadcast(pagerank.select(F.col("node").alias("docid"),
                                            "pagerank")),
                "docid",
                "left",
            ).withColumn("pagerank", F.coalesce("pagerank", F.lit(0.0)))
        else:
            joined = joined.withColumn("pagerank", F.lit(0.0))
        scored = joined.withColumn(
            "ml_score",
            ml_blend_col(
                F.col("bm25norm"), F.col("pagerank"), F.col("quality")
            ),
        )
        return diversify(
            scored.select(
                "docid", "repo", "path", "score", "quality", "ml_score"
            ),
            "repo",
            "ml_score",
            per_group=per_repo,
            k=k,
        )

    def did_you_mean(
        self, query: str, dict_terms: int = 50_000
    ) -> str | None:
        """"Did you mean?" suggestions (QueryExpansionService.java:
        85-103 + the doc-specified levenshtein fallback): the fixed
        misspelling maps apply first; any remaining term absent from
        the index is matched levenshtein<=2 against the top-df
        ``dict_terms`` dictionary slice (length-band prefiltered).
        Returns the corrected query, or None if nothing changed."""
        from search_engine_spark.config import TITLE_PREFIX
        from search_engine_spark.query.expansion import (
            EXTRA_MISSPELLINGS,
            MISSPELLINGS,
            suggest_spelling,
        )

        terms = tokenize_query(query)
        if not terms:
            return None
        merged_map = {**EXTRA_MISSPELLINGS, **MISSPELLINGS}
        mapped = [merged_map.get(t, t) for t in terms]
        known = {
            r["term"]
            for r in self.df_table.filter(
                F.col("term").isin(mapped)
            ).select("term").collect()
        }
        unknown = [t for t in mapped if t not in known]
        out = list(mapped)
        if unknown:
            if self._dym_dict is None or self._dym_dict[0] != dict_terms:
                # Built ONCE per engine generation (refresh()
                # invalidates): title-namespace terms filtered BEFORE
                # the limit and (df desc, term asc) ordering, so the
                # dictionary holds exactly the top-df dict_terms
                # content terms and its boundary is deterministic.
                from search_engine_spark.config import META_PREFIX

                self._dym_dict = (dict_terms, {
                    r["term"]
                    for r in self.df_table.filter(
                        ~F.col("term").startswith(TITLE_PREFIX)
                        & ~F.col("term").startswith(META_PREFIX)
                    )
                    .orderBy(F.desc("df"), F.asc("term"))
                    .limit(dict_terms)
                    .select("term")
                    .collect()
                })
            sug = suggest_spelling(unknown, self._dym_dict[1])
            out = [sug.get(t, t) for t in out]
        return " ".join(out) if out != terms else None

    def did_you_mean_local(
        self, query: str, dict_terms: int = 50_000
    ) -> str | None:
        """Serving twin of ``did_you_mean`` (no Spark job): identical
        semantics over the per-generation pyarrow vocabulary
        (_local_vocab_df — already content-namespace-filtered), with
        the dictionary slice cut by the same (df desc, term asc)
        order.  Pinned equal to the Spark path in pytest."""
        from search_engine_spark.query.expansion import (
            EXTRA_MISSPELLINGS,
            MISSPELLINGS,
            suggest_spelling,
        )

        terms = tokenize_query(query)
        if not terms:
            return None
        merged_map = {**EXTRA_MISSPELLINGS, **MISSPELLINGS}
        mapped = [merged_map.get(t, t) for t in terms]
        vocab = self._local_vocab_df()
        unknown = [t for t in mapped if t not in vocab]
        out = list(mapped)
        if unknown:
            top = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
            dictionary = {t for t, _ in top[:dict_terms]}
            sug = suggest_spelling(unknown, dictionary)
            out = [sug.get(t, t) for t in out]
        return " ".join(out) if out != terms else None

    def search_with_meta(
        self, query: str, k: int = 10, highlight: bool = False
    ) -> DataFrame:
        """Top-k decorated with path/repo metadata + snippet (F11).

        ``highlight=True`` returns the reference's intended
        presentation (docs/features/query-expansion-nlp.md:297-300):
        a query-term-centered snippet with <mark> tags on content
        matches, plus a <mark>-ed title (path basename).
        """
        topk = self.search(query, k)
        terms = tokenize_query(query)
        if highlight:
            from search_engine_spark.indexer.docmap import title_col
            from search_engine_spark.query.highlight import (
                highlight_snippet_col,
                mark_col,
            )

            snippet = highlight_snippet_col("content", terms)
            title = mark_col(title_col("path"), terms)
        else:
            from search_engine_spark.query.highlight import (
                plain_snippet_col,
            )

            snippet = plain_snippet_col("content")
            from search_engine_spark.indexer.docmap import title_col

            title = title_col("path")
        return (
            self.docmap.join(F.broadcast(topk), "docid")
            .select(
                "docid", "score", "repo", "path", "commit", "lang",
                title.alias("title"),
                snippet.alias("snippet"),
            )
            .orderBy(F.desc("score"), F.asc("docid"))
        )
