"""MinHash deduplication — analog of the reference's
``examples/minhash_deduplication.py`` (4 executor stages: MinhashDedupSignature
-> MinhashDedupBuckets -> MinhashDedupCluster -> MinhashDedupFilter with a
TokensCounter before/after, reference lines 24-100).

Spark-first shape: the four stages are one operator call — signature Arrow
kernel -> (bucket, sig) groupBy (ONE hash shuffle of 16-byte rows; text never
shuffles) -> star edges -> connected components bounded to the edge list —
instead of four dependent slurm jobs with an intermediate file format and a
single-task cluster stage.

    python examples/minhash_deduplication.py \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/mh_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def run(spark: SparkSession, input_path: str, out_dir: str) -> dict:
    from datatrove_spark.operators import minhash, token_stats

    docs = spark.read.parquet(input_path)
    before = token_stats.with_token_count(docs).agg({"token_count": "sum"}).first()[0]

    deduped = minhash.apply(docs).filter("minhash_keep").drop("dup_of", "minhash_keep")
    deduped.write.mode("overwrite").parquet(os.path.join(out_dir, "deduped"))

    out = spark.read.parquet(os.path.join(out_dir, "deduped"))
    after = token_stats.with_token_count(out).agg({"token_count": "sum"}).first()[0]
    return {"docs_in": docs.count(), "docs_out": out.count(), "tokens_in": before, "tokens_out": after}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="minhash-example")
    print(run(spark, args.input, args.output))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
