"""Multimodal plumbing: schema, Arrow batch shape, stub gating."""

import pytest
from pyspark.sql import functions as F

from wos_crawler_spark.operators import multimodal as mm


def test_stub_gated(spark):
    media = mm.synth_media(spark, 4)
    with pytest.raises(NotImplementedError):
        mm.extract_features(media)  # no decoder available → explicit stub


def test_fake_features_deterministic(spark):
    media = mm.synth_media(spark, 32).repartition(4)
    f1 = mm.extract_features(media, deterministic_fake=True)
    rows = f1.orderBy("asset_id").collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["features"]) == mm.FEATURE_DIM
        norm = sum(x * x for x in r["features"]) ** 0.5
        assert abs(norm - 1.0) < 1e-3
    # repartitioning must not change features (pure function of payload)
    f2 = mm.extract_features(media.repartition(8), deterministic_fake=True)
    rows2 = f2.orderBy("asset_id").collect()
    assert [r["features"] for r in rows] == [r["features"] for r in rows2]


def test_custom_decode_fn(spark):
    import numpy as np

    media = mm.synth_media(spark, 8)
    out = mm.extract_features(
        media, decode_fn=lambda p, m: np.array([float(len(p))], dtype=np.float32)
    ).collect()
    assert all(r["features"] == [float(len("image-payload-") + 64)] for r in out)


def test_resize_and_frame_sampling(spark):
    media = mm.synth_media(spark, 10, kind="video")
    resized = mm.resize_images(media, 224, 224)
    assert resized.select("meta.width").distinct().first()[0] == 224
    frames = mm.sample_frames(media, every_ms=1000)
    n = frames.groupBy("asset_id").count().collect()
    # duration = (id % 30 + 1) seconds → id+1 frames at 1fps
    expect = {r["asset_id"]: r["count"] for r in n}
    assert expect[0] == 1 and expect[9] == 10
