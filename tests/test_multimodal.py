"""Multimodal binary-column plumbing: schema, batching, features."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark.corpus import corpus_df
from search_engine_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = corpus_df(spark, 120, partitions=4).withColumn(
        "docid", F.xxhash64("repo", "path")
    )
    return mm.synthesize_media(docs).cache()


def test_media_schema_and_stats(media):
    assert dict(media.dtypes)["media"] == "binary"
    stats = {r["media_type"]: r["n"] for r in mm.media_stats(media).collect()}
    assert set(stats) == {"image/png", "audio/wav", "video/mp4"}
    assert sum(stats.values()) == 120


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_feature_extraction_matches_numpy(media):
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    rows = media.select("media_id", "media").collect()
    assert len(feats) == len(rows)
    for r in rows[:20]:
        arr = np.frombuffer(bytes(r["media"]), dtype=np.uint8)
        f = feats[r["media_id"]]
        assert f["n_bytes"] == len(arr)
        assert f["byte_mean"] == pytest.approx(float(arr.mean()), rel=1e-12)
        hist = np.bincount(arr >> 4, minlength=16)
        assert list(f["histogram16"]) == hist.tolist()
        p = hist / hist.sum()
        ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
        assert f["byte_entropy"] == pytest.approx(ent, rel=1e-12)
