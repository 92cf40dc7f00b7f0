"""Index-time upsert (indexer.build.update_documents): new content for
an existing (repo, path) key replaces the old document — tombstone +
append composition, idempotent, purge-compatible — plus the
delete-then-re-add rule (dedup consults LIVE content only, so deleted
content is re-insertable under a fresh docid).
"""

from __future__ import annotations

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df, corpus_pandas
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import (
    append_documents,
    build_index,
    compact_index,
    update_documents,
)

N_DOCS = 400
CFG = EngineConfig(slab_size=256, term_buckets=8, block_size=32)
MARKER = "zzupdatedmarkerzz"


@pytest.fixture()
def engine(spark, tmp_path):
    d = str(tmp_path / "updidx")
    build_index(spark, corpus_df(spark, N_DOCS, partitions=8), d, CFG)
    return SearchEngine(spark, d)


def _new_versions(spark, keys_rows):
    """New versions of existing docs: same (repo, path), new commit,
    content gains a unique marker token."""
    rows = [
        (
            r["repo"],
            r["path"],
            "f" * 40,
            r["lang"],
            r["content"] + f" {MARKER} {MARKER}",
        )
        for r in keys_rows
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
        "content string"
    )


def test_upsert_replaces_by_key(engine, spark):
    old = engine.docmap.orderBy("docid").limit(3).collect()
    old_ids = [int(r["docid"]) for r in old]
    m = update_documents(spark, engine.index_dir, _new_versions(spark, old))
    assert m["n_replaced"] == 3 and m["n_new"] == 3
    engine.refresh()
    # the marker finds exactly the 3 new versions, at fresh docids
    hits = engine.search_local(MARKER, 10)
    assert len(hits) == 3
    assert not ({d for d, _ in hits} & set(old_ids))
    # old versions are gone from every query surface
    q = "query parse buffer"
    assert not (set(old_ids) & {d for d, _ in engine.search_local(q, 400)})
    # keys still resolve to exactly one LIVE doc each
    live = engine._drop_tombstones(engine.docmap)
    for r in old:
        n = live.filter(
            (live.repo == r["repo"]) & (live.path == r["path"])
        ).count()
        assert n == 1


def test_upsert_idempotent_and_unchanged_noop(engine, spark):
    old = engine.docmap.orderBy("docid").limit(2).collect()
    newv = _new_versions(spark, old)
    m1 = update_documents(spark, engine.index_dir, newv)
    assert m1["n_replaced"] == 2 and m1["n_new"] == 2
    # resending the identical batch: content shas already live -> no-op
    m2 = update_documents(spark, engine.index_dir, newv)
    assert m2["n_replaced"] == 0 and m2["n_new"] == 0
    engine.refresh()
    assert len(engine.search_local(MARKER, 10)) == 2


def test_delete_then_readd_same_content(engine, spark):
    row = engine.docmap.orderBy("docid").limit(1).collect()[0]
    old_id = int(row["docid"])
    engine.delete(docids=[old_id])
    readd = spark.createDataFrame(
        [(row["repo"], row["path"], row["commit"], row["lang"],
          row["content"])],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    m = append_documents(spark, engine.index_dir, readd)
    assert m["n_new"] == 1  # dedup consults live content only
    engine.refresh()
    live = engine._drop_tombstones(engine.docmap)
    got = live.filter(live.content_sha256 == row["content_sha256"]).collect()
    assert len(got) == 1 and int(got[0]["docid"]) != old_id


def test_purge_after_upsert_conserves_live_count(engine, spark):
    n0 = int(engine.meta["n_docs"])
    old = engine.docmap.orderBy("docid").limit(3).collect()
    update_documents(spark, engine.index_dir, _new_versions(spark, old))
    compact_index(spark, engine.index_dir)
    engine.refresh()
    assert int(engine.meta["n_docs"]) == n0  # 3 replaced, 3 added
    assert engine._tombstones_arr() is None
    assert len(engine.search_local(MARKER, 10)) == 3
