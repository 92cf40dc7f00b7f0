"""Persisted ANN index (ann_index.py): build-once tables, Spark query
paths identical to the scan-form operators, and the no-Spark pyarrow
serving twin bit-identical to the Spark path."""

import pytest

from search_engine_spark.ann_index import AnnIndex, build_ann_index
from search_engine_spark.ops import similarity as sim

SF_DIR = "/root/testdata/sf0.01"
N_QUERIES = 6
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def idx(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_idx"))
    meta = build_ann_index(spark, emb, d)
    assert meta["n_vecs"] == emb.count() and meta["dim"] > 0
    return AnnIndex(spark, d)


def test_query_lsh_equals_scan(emb, idx):
    for q in range(N_QUERIES):
        a = [
            (r["vec_id"], r["cosine"])
            for r in sim.ann_rand_lsh(emb, q, K).collect()
        ]
        b = [(r["vec_id"], r["cosine"]) for r in idx.query_lsh(q, K).collect()]
        assert a == b, q


def test_query_ivf_equals_trained(emb, idx):
    cent = sim.kmeans_fit(emb).cache()
    cent.count()
    for q in range(N_QUERIES):
        a = [
            (r["vec_id"], r["cosine"])
            for r in sim.ann_ivf_trained(emb, q, K, cent=cent).collect()
        ]
        b = [(r["vec_id"], r["cosine"]) for r in idx.query_ivf(q, K).collect()]
        assert a == b, q
    cent.unpersist()


def test_lsh_local_twin_bit_identical(idx):
    for q in range(N_QUERIES):
        spark_res = [
            (r["vec_id"], r["cosine"]) for r in idx.query_lsh(q, K).collect()
        ]
        assert idx.query_lsh_local(q, K) == spark_res, q


def test_ivf_local_twin_bit_identical(idx):
    for q in range(N_QUERIES):
        spark_res = [
            (r["vec_id"], r["cosine"]) for r in idx.query_ivf(q, K).collect()
        ]
        assert idx.query_ivf_local(q, K) == spark_res, q


def test_unknown_vec_raises(idx):
    with pytest.raises(KeyError):
        idx.query_lsh_local(10**9, K)
