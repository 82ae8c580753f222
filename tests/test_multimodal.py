"""Multimodal plumbing tests: schema stability, Arrow batch shape,
partition parallelism of the stubbed decode/resize/frame-sample UDFs."""

from __future__ import annotations

from scylla_pg_cdc_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_schema,
    resize_images,
    sample_frames,
    synthesize_assets,
)


def test_synthesize_deterministic(spark):
    a = synthesize_assets(spark, 16).collect()
    b = synthesize_assets(spark, 16).collect()
    assert [r["asset_id"] for r in a] == [r["asset_id"] for r in b]
    assert a[0]["content"] == b[0]["content"]
    assert {r["media_type"] for r in a} == {"image", "audio", "video"}


def test_extract_features_schema_and_determinism(spark):
    assets = synthesize_assets(spark, 32).repartition(4)
    feats = extract_features(assets)
    assert feats.schema["features"].dataType.simpleString() == "array<float>"
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    for r in rows.values():
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
        assert r["n_bytes"] == 128
    rows2 = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert rows[0]["features"] == rows2[0]["features"]


def test_resize_images_dims_and_bytes(spark):
    assets = synthesize_assets(spark, 30)
    out = resize_images(assets, width=32, height=32).collect()
    n_images = sum(1 for r in synthesize_assets(spark, 30).collect()
                   if r["media_type"] == "image")
    assert len(out) == n_images
    for r in out:
        assert (r["width"], r["height"]) == (32, 32)
        assert len(r["frame"] if False else r["content"]) == 32 * 32 // 64


def test_sample_frames_cardinality(spark):
    assets = synthesize_assets(spark, 30)
    frames = sample_frames(assets, every_ms=5000)
    per_asset = {}
    for r in frames.collect():
        per_asset.setdefault(r["asset_id"], []).append(r)
    videos = {
        r["asset_id"]: r["duration_ms"]
        for r in assets.collect()
        if r["media_type"] == "video"
    }
    assert set(per_asset) == set(videos)
    for aid, rows in per_asset.items():
        expected = max(1, videos[aid] // 5000)
        assert len(rows) == expected
        assert sorted(r["frame_idx"] for r in rows) == list(range(expected))
        assert all(len(r["frame"]) == 16 for r in rows)


def test_media_schema_shape():
    names = [f.name for f in media_schema().fields]
    assert names == [
        "asset_id", "media_type", "content", "width", "height",
        "duration_ms", "codec",
    ]
