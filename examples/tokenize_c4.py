"""Tokenize a corpus to binary .ds training shards — analog of the
reference's ``examples/tokenize_c4.py`` (JsonlReader over C4 ->
DocumentTokenizer with shuffle + eos, reference lines 1-47).

Spark-first shape: the deterministic data-keyed document shuffle is a
repartitionByRange on a content hash (order is a pure function of seed+data,
not of worker timing), and each output partition streams its shard to disk in
the reference byte layout (.ds tokens + .ds.index doc-end uint64s + optional
.ds.loss mask). ``check_dataset`` mirrors the reference's validation tool.

    python examples/tokenize_c4.py \
        --input /root/testdata/sf0.001/documents.parquet --output /tmp/tok_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

EOS = 0


def run(spark: SparkSession, input_path: str, out_dir: str) -> dict:
    from datatrove_spark.operators import tokenizer
    from datatrove_spark.operators.dataset import check_dataset

    docs = spark.read.parquet(input_path)
    shuffled = tokenizer.shuffled(docs, seed="tokenize-c4", partitions=8)
    ds_dir = os.path.join(out_dir, "tokenized")
    tokenizer.write_tokenized(shuffled, ds_dir, eos_token_id=EOS, save_loss=True)
    check_dataset(ds_dir, eos_token_id=EOS)  # raises on corruption
    shards = sorted(f for f in os.listdir(ds_dir) if f.endswith(".ds"))
    tokens = sum(os.path.getsize(os.path.join(ds_dir, s)) // 2 for s in shards)
    return {"shards": len(shards), "tokens": tokens}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="tokenize-example")
    print(run(spark, args.input, args.output))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
