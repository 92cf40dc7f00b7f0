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


def test_resize_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.resize_image(b"\x89PNG", 64, 64)


def test_frame_sampling_fanout(media):
    frames = mm.sample_frames(media, frame_bytes=512, every_n=3).collect()
    assert frames, "video rows must fan out to frames"
    vids = {r["media_id"]: bytes(r["media"])
            for r in media.filter(F.col("media_type") == "video/mp4")
            .select("media_id", "media").collect()}
    by_vid = {}
    for r in frames:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(by_vid) == set(vids)
    for mid, rs in by_vid.items():
        idxs = sorted(r["frame_idx"] for r in rs)
        assert idxs == list(range(0, max(1, len(vids[mid]) // 512), 3))
        for r in rs:
            off = r["frame_idx"] * 512
            assert bytes(r["frame"]) == vids[mid][off:off + 512]


def test_audio_windows_match_numpy(media):
    wins = mm.audio_windows(media, win_bytes=256, hop_bytes=128).collect()
    assert wins
    auds = {r["media_id"]: bytes(r["media"])
            for r in media.filter(F.col("media_type") == "audio/wav")
            .select("media_id", "media").collect()}
    by_id = {}
    for r in wins:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == set(auds)
    for mid, rs in list(by_id.items())[:5]:
        arr = np.frombuffer(auds[mid], dtype=np.uint8)
        if len(arr) < 256:
            arr = np.pad(arr, (0, 256 - len(arr)))
        for r in sorted(rs, key=lambda x: x["window_idx"])[:4]:
            w = arr[r["window_idx"] * 128:r["window_idx"] * 128 + 256]
            w = w.astype(np.float64)
            assert r["rms"] == pytest.approx(float(np.sqrt((w * w).mean())),
                                             rel=1e-12)
            assert r["peak"] == int(w.max())


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
