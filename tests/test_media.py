"""Multimodal plumbing: binary columns, mapInPandas batch shape, schemas,
determinism across partitionings."""

from __future__ import annotations

import pytest

from datatrove_spark.operators import media
from datatrove_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def with_media(spark):
    return media.attach_fake_media(generate_pages(spark, 60).select("url"))


def test_payloads_binary_and_deterministic(spark, with_media):
    row = with_media.first()
    assert isinstance(row.media_bytes, (bytes, bytearray))
    assert len(row.media_bytes) == 64  # 4 md5 chunks
    a = sorted((r.url, bytes(r.media_bytes)) for r in with_media.collect())
    b = sorted(
        (r.url, bytes(r.media_bytes))
        for r in media.attach_fake_media(
            generate_pages(spark, 60, partitions=7).select("url")
        ).collect()
    )
    assert a == b


def test_decode_schema_and_partition_independence(spark, with_media):
    out = media.decode_images(with_media)
    assert out.schema == media.DECODED_SCHEMA
    rows = {r.url: (r.width, r.height, r.n_bytes) for r in out.collect()}
    assert all(64 <= w < 1088 and 64 <= h < 1088 for w, h, _ in rows.values())
    rows2 = {
        r.url: (r.width, r.height, r.n_bytes)
        for r in media.decode_images(with_media.repartition(9)).collect()
    }
    assert rows == rows2


def test_features_fixed_dim(spark, with_media):
    out = media.extract_features(with_media)
    assert out.schema == media.FEATURE_SCHEMA
    r = out.first()
    assert len(r.feature) == media.FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in r.feature)


def test_frame_sample(spark, with_media):
    frames = media.frame_sample(with_media, every_n=2)
    per_url = frames.groupBy("url").count().collect()
    # 64-byte payload -> 4 pseudo-frames -> every 2nd -> 2 frames
    assert all(r["count"] == 2 for r in per_url)
    r = frames.first()
    assert len(r.frame_bytes) == 16
    assert r.frame_idx % 2 == 0
