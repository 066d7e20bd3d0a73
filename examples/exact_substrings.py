"""Exact-substrings deduplication — analog of the reference's
``examples/exact_substrings.py`` (ESDatasetToSequence -> external Rust
suffix-array tool -> ESMergeSequences -> ESRangeRemover; reference lines
1-74 and the deduplicate-text-datasets paper).

Spark-first shape: a token position lies in a duplicated span of length >= L
iff it is covered by an L-gram occurring >= 2 times corpus-wide, so the whole
external-tool round-trip becomes one count-over-window on gram hashes plus an
interval-cover cut — distributed, no single-node merge stage.

    python examples/exact_substrings.py \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/es_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def run(spark: SparkSession, input_path: str, out_dir: str, length: int = 20) -> dict:
    from pyspark.sql import functions as F

    from datatrove_spark.operators import exact_substrings

    docs = spark.read.parquet(input_path)
    out = exact_substrings.apply(docs, length=length)
    out.select("doc_id", F.col("es_text").alias("text"), "n_words", "n_removed").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "output"))
    stats = (
        spark.read.parquet(os.path.join(out_dir, "output"))
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_removed").alias("removed"),
        )
        .first()
    )
    return {"docs": stats["docs"], "words": int(stats["words"]), "removed_words": int(stats["removed"])}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--length", type=int, default=20, help="duplicated-span threshold in tokens")
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="exact-substrings-example")
    print(run(spark, args.input, args.output, args.length))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
