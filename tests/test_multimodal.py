"""Multimodal column plumbing (operators.multimodal): schemas, Arrow
batch iteration, explode-then-decode frame sampling, metadata-only
plans pruning the binary payload."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ramen_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=30)


def test_feature_extraction_shape(spark, media):
    out = extract_features(media).collect()
    assert len(out) == 30
    assert all(len(r["features"]) == FEATURE_DIM for r in out)
    # deterministic fake: same input → same features
    again = extract_features(media).collect()
    assert {r["media_id"]: tuple(r["features"]) for r in out} == {
        r["media_id"]: tuple(r["features"]) for r in again
    }


def test_strict_mode_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(media, strict=True).collect()


def test_frame_sampling_fanout(spark, media):
    videos = media.filter(F.col("kind") == "video")
    out = sample_frames(videos, every_s=1.0)
    rows = out.collect()
    n_videos = videos.count()
    # 4s duration → offsets 0,1,2,3 per video
    assert len(rows) == n_videos * 4
    assert all(r["frame"] is not None for r in rows)


def test_metadata_only_plan_prunes_binary(spark, media, tmp_path):
    """Reading just metadata must NOT read the content column — the
    100 TB property that makes media tables queryable."""
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    df = spark.read.parquet(p).select("media_id", "kind", "meta.mime")
    plan = df._jdf.queryExecution().executedPlan().toString()
    schema_seg = plan.split("ReadSchema:")[1]
    assert "content" not in schema_seg
