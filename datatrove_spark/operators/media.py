"""Multimodal columns — opaque binary payloads + typed metadata.

The reference declares but never uses a Media type (src/datatrove/data.py:
18-28, "currently not used"); a modern curation engine needs the plumbing,
so this module makes it real on the Spark side:

- schema: media payloads are ``BINARY`` columns beside typed metadata
  (mime, width, height, duration_ms) — never strings, never driver-side;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  batch transforms: Arrow batches in, Arrow batches out, constant memory
  per partition, schema declared up front;
- the actual codec calls are STUBBED behind an import-try (image/audio
  libraries are not installed in this environment): with Pillow present
  the real decoder runs; otherwise a clearly-marked deterministic fake
  derives metadata/features from the payload bytes via the engine's h60
  hash — so partitioning, UDF signatures, batch shapes, and schemas are
  fully exercised and tested today, and swapping in real codecs changes
  only the per-batch kernel body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from datatrove_spark.functions.hashing import py_hash60

NAME = "media"

MEDIA_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("media_bytes", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Deterministic binary payload per url (JVM-side md5 expansion) — the
    test stand-in for real crawled image bytes."""
    payload = F.concat(
        *[F.unhex(F.md5(F.concat(F.col(url_col), F.lit(f"#chunk{i}")))) for i in range(4)]
    )
    mime = F.when(F.pmod(F.abs(F.hash(url_col)), F.lit(3)) == 0, "image/png").otherwise(
        "image/jpeg"
    )
    return df.withColumn("media_bytes", payload).withColumn("mime", mime)


def _decode_real(b: bytes):
    """Real decoder path (Pillow). Raises ImportError when unavailable."""
    import io

    from PIL import Image  # noqa: F401

    img = Image.open(io.BytesIO(b))
    return img.width, img.height


def _decode_fake(b: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE decode: dimensions derived from payload hash.
    Stands in for the codec call only — everything around it is real."""
    h = py_hash60(b.hex())
    return 64 + h % 1024, 64 + (h >> 10) % 1024


def decode_images(df: DataFrame) -> DataFrame:
    """mapInPandas decode: (url, media_bytes, mime) -> DECODED_SCHEMA."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401

            decode = _decode_real
        except ImportError:
            decode = _decode_fake
        for pdf in it:
            dims = [decode(b) for b in pdf["media_bytes"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "mime": pdf["mime"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(b) for b in pdf["media_bytes"]],
                }
            )

    return df.select("url", "media_bytes", "mime").mapInPandas(batches, DECODED_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction -> fixed-dim float vector per item.
    Kernel is a deterministic hash-fake (a real model swap-in keeps the
    same batch contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["media_bytes"]:
                h = py_hash60(b.hex())
                feats.append(
                    [((h >> (3 * j)) % 1000) / 1000.0 for j in range(FEATURE_DIM)]
                )
            yield pd.DataFrame({"url": pdf["url"], "feature": feats})

    return df.select("url", "media_bytes").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-style frame sampling stub: splits the payload into fixed-size
    pseudo-frames and keeps every n-th — exercises the explode shape real
    frame extraction would produce."""
    frames = F.transform(
        F.sequence(F.lit(0), F.floor(F.length("media_bytes") / 16).cast("int") - 1),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col("media_bytes"), (i * 16 + 1).cast("int"), 16).alias("frame_bytes"),
        ),
    )
    kept = F.filter(frames, lambda fr: fr["frame_idx"] % every_n == 0)
    return df.select("url", F.explode(kept).alias("fr")).select(
        "url", F.col("fr.frame_idx").alias("frame_idx"), F.col("fr.frame_bytes").alias("frame_bytes")
    )
