"""Process a Common-Crawl WARC dump — analog of the reference's
``examples/process_common_crawl_dump.py`` (WarcReader -> URLFilter ->
Trafilatura -> LanguageFilter -> Gopher repetition/quality -> JsonlWriter,
reference lines 23-45).

Spark-first shape: WARC archives land as ``binaryFile`` rows and parse in a
distributed mapInPandas pass (``sources/warc.py``); the filters compose into
one lazy plan; the jsonl sink is a gzip-partitioned distributed write.

Run locally (synthesizes a small archive when no --input is given):

    python examples/process_common_crawl_dump.py --output /tmp/cc_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def _synthesize_warc(spark: SparkSession, path: str) -> None:
    """A tiny deterministic .warc.gz so the example is runnable anywhere —
    the html bodies come from the engine's synthetic pages generator, whose
    prose distribution is the one the quality battery is calibrated on."""
    from datatrove_spark.sources.pages import generate_pages
    from datatrove_spark.sources.warc import build_warc_bytes

    rows = generate_pages(spark, 40).select("url", "html").collect()
    records = [
        {"url": r["url"], "ts": "2024-01-01T00:00:00Z", "body": bytes(r["html"])}
        for r in rows
    ]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(build_warc_bytes(records, compress=True))


def run(spark: SparkSession, warc_path: str, out_dir: str) -> int:
    from datatrove_spark.operators import extract, gopher_quality, gopher_repetition, langid
    from datatrove_spark.sources.readers import write_jsonl
    from datatrove_spark.sources.warc import read_warc

    pages = read_warc(spark, warc_path)
    docs = extract.apply(pages, html_col="html")
    docs = langid.apply(docs)
    docs = gopher_repetition.apply(docs)
    docs = gopher_quality.apply(docs)
    kept = docs.filter(
        "langid_keep AND gopher_repetition_reason IS NULL AND gopher_quality_reason IS NULL"
    ).select("url", "text", "language")
    write_jsonl(kept, os.path.join(out_dir, "output"))
    return spark.read.json(os.path.join(out_dir, "output")).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="path/glob of .warc / .warc.gz files")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="cc-dump-example")
    warc = args.input
    if not warc:
        warc = os.path.join(args.output, "_synth", "dump.warc.gz")
        _synthesize_warc(spark, warc)
    n = run(spark, warc, args.output)
    print({"kept_docs": n})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
