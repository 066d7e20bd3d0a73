"""URL deduplication — analog of the reference's
``examples/url_deduplication.py`` (UrlDedupSignature -> UrlFindDedups ->
UrlDedupFilter with a priority function keeping the "best" copy per URL;
reference lines 24-79).

Spark-first shape: one window over the normalized-url key; the priority rule
(here: longest document wins, ties to lowest doc_id) is a window ORDER BY
instead of the reference's signature-sort machinery.

    python examples/url_deduplication.py \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/ud_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def run(spark: SparkSession, input_path: str, out_dir: str, url_col: str = "url") -> dict:
    from pyspark.sql import functions as F

    from datatrove_spark.operators import url_dedup

    docs = spark.read.parquet(input_path)
    if url_col not in docs.columns:
        # the testdata documents table carries no url column; derive a
        # deterministic one so the example is runnable as-is
        docs = docs.withColumn(
            "url",
            F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/p/"), F.pmod("doc_id", F.lit(7))),
        )
    out = url_dedup.apply(docs, priority_col="n_chars")
    kept = out.filter("url_dedup_keep")
    kept.write.mode("overwrite").parquet(os.path.join(out_dir, "output"))
    return {
        "docs_in": docs.count(),
        "docs_out": spark.read.parquet(os.path.join(out_dir, "output")).count(),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="url-dedup-example")
    print(run(spark, args.input, args.output))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
