"""WARC reader: spec-shaped archives round-trip into the pages schema
(SURVEY §2.1 WarcReader — response/conversion filtering, HTTP envelope
strip, mime filter, gzip archives)."""

from __future__ import annotations

import datetime

import pytest

from datatrove_spark.sources.warc import build_warc_bytes, parse_warc_bytes, read_warc

RECORDS = [
    {"url": "https://a.example/1", "ts": "2024-03-01T10:00:00Z", "body": "<html><p>page one</p></html>"},
    {"url": "https://a.example/skip-mime", "ts": "2024-03-01T10:01:00Z", "body": "%PDF-1.4",
     "mime": "application/pdf"},
    {"url": "https://a.example/2", "ts": "2024-03-01T10:02:00Z", "body": "plain wet text here",
     "type": "conversion", "mime": "text/plain"},
    {"url": "https://a.example/skip-type", "ts": "2024-03-01T10:03:00Z", "body": "req",
     "type": "request"},
    {"url": "https://a.example/3", "ts": "2024-03-01T10:04:00Z",
     "body": "caf\xe9 latin1".encode("latin-1")},  # non-utf8 -> latin-1 fallback
]


def test_parse_warc_bytes_plain_and_gz():
    for compress in (False, True):
        data = build_warc_bytes(RECORDS, compress=compress)
        rows = list(parse_warc_bytes("f.warc", data))
        urls = [r[2] for r in rows]
        assert urls == ["https://a.example/1", "https://a.example/2", "https://a.example/3"]
        assert rows[0][5] == "<html><p>page one</p></html>"
        assert rows[1][5] == "plain wet text here"
        assert "café" in rows[2][5]
        assert rows[0][4] == b"<html><p>page one</p></html>"  # html bytes, envelope stripped


def test_read_warc_spark(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(build_warc_bytes(RECORDS))
    (tmp_path / "b.warc.gz").write_bytes(build_warc_bytes(RECORDS[:1], compress=True))
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.orderBy("warc_file", "url").collect()
    assert len(rows) == 4  # 3 from a.warc + 1 from b.warc.gz
    assert rows[0].warc_ts == datetime.datetime(2024, 3, 1, 10, 0)
    assert {r.url for r in rows} == {
        "https://a.example/1", "https://a.example/2", "https://a.example/3",
    }
    assert all(r.record_id.startswith("<urn:uuid:rec-") for r in rows)


def test_warc_to_quality_pipeline(spark, tmp_path):
    """End-to-end: raw WARC archive -> parse -> html extract -> fused quality
    battery — the full ingestion path a Common-Crawl job runs."""
    from pyspark.sql import functions as F

    from datatrove_spark.operators import extract
    from datatrove_spark.registry import quality_pipeline

    good = (
        "The quick brown fox jumps over the lazy dog and runs far away to the hills. "
        "It was a bright morning and the birds were singing with joy in the trees. "
        "Every day the people of the town would walk to the market with their goods. "
        "They would trade stories and bread and have a fine time among friends. "
        "Nothing could spoil the calm of that place, not even the rain at night."
    )
    records = [
        {"url": "https://w.example/good", "ts": "2024-03-01T10:00:00Z",
         "body": f"<html><body><h1>T</h1><p>{good}</p></body></html>"},
        {"url": "https://w.example/short", "ts": "2024-03-01T10:01:00Z",
         "body": "<html><body><p>too short.</p></body></html>"},
    ]
    (tmp_path / "cc.warc.gz").write_bytes(build_warc_bytes(records, compress=True))

    pages = read_warc(spark, str(tmp_path / "cc.warc.gz"))
    extracted = extract.apply(pages.withColumn("html", F.col("html").cast("string")))
    out = {r.url: (r.keep, r.drop_reason) for r in quality_pipeline(extracted).collect()}
    assert out["https://w.example/good"][0] is True
    # repetition runs first (FineWeb order): a 2-word doc trips the top-2-gram
    # length rule before gopher_short_doc can fire
    assert out["https://w.example/short"] == (False, "top_2_gram")
