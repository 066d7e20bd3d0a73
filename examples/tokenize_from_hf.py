"""Tokenize a Hugging-Face-layout dataset to .ds shards — analog of the
reference's ``examples/tokenize_from_hf_to_s3.py`` (HuggingFaceDatasetReader
-> DocumentTokenizer writing to s3; reference lines 1-108).

Spark-first shape: the hub parquet-export layout (train-NNNNN-of-NNNNN
shards) reads/writes through ``sources/hf_bridge.py`` with no `datasets`
dependency; remote sinks (s3a://, hdfs://) work through the Hadoop
filesystem layer — this example uses local paths so it runs anywhere.

    python examples/tokenize_from_hf.py --output /tmp/hf_tok_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def run(spark: SparkSession, input_path: str, out_dir: str) -> dict:
    from datatrove_spark.operators import tokenizer
    from datatrove_spark.sources import hf_bridge

    # stage 1: export the corpus in the HF hub parquet layout (stand-in for
    # a dataset somebody pushed to the hub)
    hub_dir = os.path.join(out_dir, "hf_export")
    docs = spark.read.parquet(input_path)
    shards = hf_bridge.write_hf_export(docs, hub_dir)

    # stage 2: read it back the way a consumer would, shuffle, tokenize
    corpus = hf_bridge.read_hf_export(spark, hub_dir)
    shuffled = tokenizer.shuffled(corpus, seed="hf-tokenize", partitions=4)
    ds_dir = os.path.join(out_dir, "tokenized")
    tokenizer.write_tokenized(shuffled, ds_dir, eos_token_id=0)
    ds_shards = sorted(f for f in os.listdir(ds_dir) if f.endswith(".ds"))
    return {"hub_shards": len(shards), "ds_shards": len(ds_shards), "docs": corpus.count()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="hf-tokenize-example")
    print(run(spark, args.input, args.output))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
