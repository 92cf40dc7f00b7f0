"""Catalog seam (TableStore), engine refresh, fresh-build cleanup,
and epsilon-converged PageRank."""

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.catalog import IcebergStore, ParquetStore, store_for
from search_engine_spark.config import EngineConfig
from search_engine_spark.corpus import corpus_df
from search_engine_spark.engine import SearchEngine
from search_engine_spark.indexer.build import append_documents, build_index
from search_engine_spark.ops.graph import pagerank, pagerank_converged

CFG = EngineConfig(slab_size=128, term_buckets=4, block_size=32)


def test_store_for_dispatch(tmp_path):
    s = store_for(str(tmp_path))
    assert isinstance(s, ParquetStore) and s.kind == "parquet"
    i = store_for("iceberg://local.search.idx1")
    assert isinstance(i, IcebergStore) and i.kind == "iceberg"
    assert i.ident("segments") == "local.search.idx1_segments"


def test_parquet_store_roundtrip(spark, tmp_path):
    s = ParquetStore(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    assert not s.exists("t")
    s.write(df, "t")
    assert s.exists("t")
    assert s.read(spark, "t").count() == 2
    s.write(df, "t", mode="append")
    assert s.read(spark, "t").count() == 4
    s.put_meta(spark, {"x": 1})
    assert s.get_meta(spark) == {"x": 1}
    s.drop("t")
    assert not s.exists("t")


def test_parquet_store_dynamic_overwrite(spark, tmp_path):
    s = ParquetStore(str(tmp_path))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    d1 = spark.createDataFrame([(0, "a"), (1, "b")], "p int, v string")
    s.write(d1, "t", mode="dynamic_overwrite", partition_by="p")
    d2 = spark.createDataFrame([(1, "B")], "p int, v string")
    s.write(d2, "t", mode="dynamic_overwrite", partition_by="p")
    rows = {r["p"]: r["v"] for r in s.read(spark, "t").collect()}
    assert rows == {0: "a", 1: "B"}  # partition 0 untouched, 1 replaced


def test_build_through_store_and_refresh(spark, tmp_path):
    d = str(tmp_path / "idx")
    docs = corpus_df(spark, 200, partitions=4)
    eng = SearchEngine.build(spark, docs, d, CFG)
    n0 = int(eng.meta["n_docs"])
    before = [r["docid"] for r in eng.search("merge", 5).collect()]
    assert os.path.exists(f"{d}/meta.json")

    extra = corpus_df(spark, 260, partitions=4).filter(F.col("path").isNotNull())
    append_documents(spark, d, extra.subtract(docs))
    # a STALE engine still carries the old corpus stats...
    assert int(eng.meta["n_docs"]) == n0
    # ...refresh() picks up the appended generation
    eng.refresh()
    assert int(eng.meta["n_docs"]) > n0
    after = [r["docid"] for r in eng.search("merge", 5).collect()]
    assert len(after) >= len(before)


def test_fresh_build_clears_stale_state(spark, tmp_path):
    d = str(tmp_path / "idx2")
    build_index(spark, corpus_df(spark, 600, partitions=4), d, CFG)
    big_slabs = {
        r["slab"]
        for r in spark.read.parquet(f"{d}/segments").select("slab").distinct().collect()
    }
    assert len(big_slabs) > 1
    # rebuild the SAME dir with a much smaller corpus
    build_index(spark, corpus_df(spark, 100, partitions=2), d, CFG)
    spark.catalog.refreshByPath(f"{d}/segments")
    small_slabs = {
        r["slab"]
        for r in spark.read.parquet(f"{d}/segments").select("slab").distinct().collect()
    }
    assert small_slabs == {0}, "stale slabs from the prior corpus survived"
    eng = SearchEngine(spark, d)
    assert int(eng.meta["n_docs"]) <= 100
    from search_engine_spark.indexer.lineage import completed_slabs

    assert completed_slabs(spark, d) == {0}


def test_pagerank_converged(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)], "src long, dst long"
    )
    pr_fixed = {
        r["node"]: r["score"]
        for r in pagerank(edges, iters=60, normalize=True).collect()
    }
    pr_eps, iters = pagerank_converged(edges, eps=1e-9, max_iters=100)
    got = {r["node"]: r["score"] for r in pr_eps.collect()}
    assert 0 < iters < 100  # converged before the cap
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for n, s in pr_fixed.items():
        assert got[n] == pytest.approx(s, abs=1e-6), n
    # eps so loose it stops immediately
    _, iters1 = pagerank_converged(edges, eps=1e9, max_iters=100)
    assert iters1 == 1


def test_pagerank_local_parity(spark):
    """The driver-local numpy kernel must match the Spark op on a
    deterministic pseudo-random graph: same iteration count, same
    scores (to float tolerance — bincount vs shuffle-sum fold order),
    identical rank order."""
    import numpy as np

    from search_engine_spark.ops.graph import pagerank_local

    rng = np.random.RandomState(7)
    n_nodes, n_edges = 200, 1500
    src = rng.randint(0, n_nodes, n_edges)
    dst = rng.randint(0, n_nodes, n_edges)
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    )
    pr, iters_s = pagerank_converged(edges, eps=1e-4, max_iters=100)
    want = {r["node"]: r["score"] for r in pr.collect()}
    nodes, scores, iters_l = pagerank_local(src, dst, eps=1e-4,
                                            max_iters=100)
    assert iters_l == iters_s
    got = dict(zip(nodes.tolist(), scores.tolist()))
    assert set(got) == set(want)
    for n, s in want.items():
        assert got[n] == pytest.approx(s, rel=1e-9), n
