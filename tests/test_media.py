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


def test_real_container_decode(spark):
    """decode_images must return TRUE dimensions for real PNG/BMP/GIF/JPEG
    bytes via the stdlib header parsers — no image library involved."""
    from datatrove_spark.operators import media

    png = media.synthesize_png(17, 9, (10, 200, 30))
    bmp = media.synthesize_bmp(33, 21, (255, 0, 0))
    gif = b"GIF89a" + (7).to_bytes(2, "little") + (5).to_bytes(2, "little") + b"\x00" * 20
    assert media.parse_image_dims(png) == (17, 9)
    assert media.parse_image_dims(bmp) == (33, 21)
    assert media.parse_image_dims(gif) == (7, 5)
    assert media.parse_image_dims(b"not an image at all, promise!") is None

    rows = [("u1", png, "image/png"), ("u2", bmp, "image/bmp")]
    df = spark.createDataFrame(rows, media.MEDIA_SCHEMA)
    got = {r.url: (r.width, r.height, r.n_bytes) for r in media.decode_images(df).collect()}
    assert got["u1"] == (17, 9, len(png))
    assert got["u2"] == (33, 21, len(bmp))


def test_real_bmp_features(spark):
    from datatrove_spark.operators import media

    bmp = media.synthesize_bmp(10, 10, (200, 100, 50))
    assert media.bmp_mean_rgb(bmp) == (200.0, 100.0, 50.0)
    df = spark.createDataFrame([("u", bmp, "image/bmp")], media.MEDIA_SCHEMA)
    feat = media.extract_features(df).collect()[0]["feature"]
    assert len(feat) == media.FEATURE_DIM
    assert feat[0] == pytest.approx(200 / 255, abs=1e-6)
    assert feat[1] == pytest.approx(100 / 255, abs=1e-6)
    assert feat[3] == pytest.approx(1.0)  # square aspect


def test_synthetic_images_end_to_end(spark):
    """attach_synthetic_images -> decode -> features: the whole multimodal
    path on REAL bytes, deterministic across calls."""
    from datatrove_spark.operators import media

    urls = spark.createDataFrame([(f"https://x/{i}",) for i in range(20)], "url string")
    withm = media.attach_synthetic_images(urls)
    dec = media.decode_images(withm).collect()
    assert len(dec) == 20
    for r in dec:
        assert 4 <= r.width <= 33 and 4 <= r.height <= 27
    again = {r.url: (r.width, r.height) for r in media.decode_images(media.attach_synthetic_images(urls)).collect()}
    assert again == {r.url: (r.width, r.height) for r in dec}
