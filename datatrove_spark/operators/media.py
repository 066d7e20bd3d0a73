"""Multimodal columns — opaque binary payloads + typed metadata.

The reference declares but never uses a Media type (src/datatrove/data.py:
18-28, "currently not used"); a modern curation engine needs the plumbing,
so this module makes it real on the Spark side:

- schema: media payloads are ``BINARY`` columns beside typed metadata
  (mime, width, height, duration_ms) — never strings, never driver-side;
- decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  batch transforms: Arrow batches in, Arrow batches out, constant memory
  per partition, schema declared up front;
- decode is REAL for the common container formats without any external
  library: pure-stdlib header parsers for PNG (IHDR), GIF, BMP
  (BITMAPINFOHEADER) and JPEG (SOF marker scan) extract true dimensions,
  and uncompressed 24-bit BMP pixels yield true mean-RGB features; Pillow,
  when installed, widens full-decode coverage (gated import); payloads in
  formats neither path understands fall back to a clearly-marked
  deterministic hash fake — so partitioning, UDF signatures, batch shapes,
  and schemas are fully exercised and tested today against REAL bytes
  (``synthesize_png``/``synthesize_bmp`` below emit valid files), and
  swapping in heavier codecs changes only the per-batch kernel body.
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


def synthesize_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A valid solid-color 8-bit RGB PNG, stdlib only (zlib + struct)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width  # filter 0 + pixels
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def synthesize_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A valid uncompressed 24-bit BMP (BITMAPINFOHEADER), stdlib only."""
    import struct

    row = (bytes(rgb[::-1]) * width + b"\x00\x00\x00")[: (width * 3 + 3) & ~3]
    pixels = row * height
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(pixels), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
        + pixels
    )


def parse_image_dims(b: bytes) -> tuple[int, int] | None:
    """REAL dimension decode for PNG / GIF / BMP / JPEG from the container
    headers — pure stdlib, no image library. None for unknown formats."""
    import struct

    if len(b) < 26:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return int(w), int(h)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return int(w), int(h)
    if b[:2] == b"BM":
        hdr_sz = struct.unpack("<I", b[14:18])[0]
        if hdr_sz >= 40:  # BITMAPINFOHEADER
            w, h = struct.unpack("<ii", b[18:26])
            return int(w), abs(int(h))
        w, h = struct.unpack("<HH", b[18:22])  # BITMAPCOREHEADER
        return int(w), int(h)
    if b[:2] == b"\xff\xd8":  # JPEG: scan for a start-of-frame marker
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seg_len
    return None


def bmp_mean_rgb(b: bytes) -> tuple[float, float, float] | None:
    """REAL pixel statistics for uncompressed 24-bit BMPs (stdlib only):
    per-channel mean over all pixels. None for anything else."""
    import struct

    if b[:2] != b"BM" or len(b) < 54:
        return None
    data_off = struct.unpack("<I", b[10:14])[0]
    hdr_sz = struct.unpack("<I", b[14:18])[0]
    if hdr_sz < 40:
        return None
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]  # 26:28 is the planes field
    comp = struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) & ~3
    rows = abs(h)
    tot = [0, 0, 0]
    for r in range(rows):
        row = b[data_off + r * stride : data_off + r * stride + w * 3]
        if len(row) < w * 3:
            return None
        tot[0] += sum(row[2::3])  # BGR on disk
        tot[1] += sum(row[1::3])
        tot[2] += sum(row[0::3])
    n = w * rows
    return tot[0] / n, tot[1] / n, tot[2] / n


def _decode_real(b: bytes):
    """Real decoder path (Pillow). Raises ImportError when unavailable."""
    import io

    from PIL import Image  # noqa: F401

    img = Image.open(io.BytesIO(b))
    return img.width, img.height


def attach_synthetic_images(df: DataFrame, url_col: str = "url") -> DataFrame:
    """REAL image payloads, deterministic per url: valid PNG or BMP files
    whose dimensions/color derive from the url hash — decode_images returns
    their true dimensions, extract_features their true mean color. Built in
    an Arrow batch (synthesis needs zlib, not expressible JVM-side)."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(BinaryType())
    def payload(urls: pd.Series) -> pd.Series:
        def one(u: str) -> bytes:
            h = py_hash60(u or "")
            w, hh = 4 + h % 29, 4 + (h >> 5) % 23
            rgb = ((h >> 10) % 256, (h >> 18) % 256, (h >> 26) % 256)
            if h % 2 == 0:
                return synthesize_png(w, hh, rgb)
            return synthesize_bmp(w, hh, rgb)

        return urls.map(one)

    @F.pandas_udf(StringType())
    def mime_of(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: "image/png" if py_hash60(u or "") % 2 == 0 else "image/bmp")

    return df.withColumn("media_bytes", payload(F.col(url_col))).withColumn(
        "mime", mime_of(F.col(url_col))
    )


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

            lib_decode = _decode_real
        except ImportError:
            lib_decode = None

        def decode(b: bytes) -> tuple[int, int]:
            dims = parse_image_dims(b)  # real, stdlib, common containers
            if dims is not None:
                return dims
            if lib_decode is not None:
                try:
                    return lib_decode(b)
                except Exception:  # noqa: BLE001 — corrupt payload
                    pass
            return _decode_fake(b)

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
    For uncompressed 24-bit BMPs the leading features are REAL image
    statistics (mean R/G/B scaled to [0,1], aspect ratio, log-size); other
    payloads get the deterministic hash-fake (a real model swap-in keeps
    the same batch contract)."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["media_bytes"]:
                rgb = bmp_mean_rgb(b)
                if rgb is not None:
                    w, h = parse_image_dims(b) or (1, 1)
                    head = [
                        rgb[0] / 255.0,
                        rgb[1] / 255.0,
                        rgb[2] / 255.0,
                        w / max(h, 1),
                        math.log1p(len(b)) / 20.0,
                    ]
                else:
                    head = []
                hv = py_hash60(b.hex())
                tail = [
                    ((hv >> (3 * j)) % 1000) / 1000.0
                    for j in range(FEATURE_DIM - len(head))
                ]
                feats.append([float(x) for x in head + tail])
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
