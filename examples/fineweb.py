"""FineWeb reproduction — the engine's analog of the reference's
``examples/fineweb.py`` (two SlurmPipelineExecutor jobs: base processing
url-filter -> extract -> langid -> gopher/c4/fineweb filters -> PII,
then a 4-stage minhash dedup; reference lines 30-96 and 99-171).

Spark-first shape: the whole curation flow is ONE lazy plan materialized
once into a keep-partitioned sink (no per-stage temp files), and the dedup
stage chain is a single hash-partitioned signature shuffle plus the
edge-bounded connected-components step — not 8000 slurm array tasks and a
single-node cluster stage.

Run locally:

    python examples/fineweb.py --generate 5000 --output /tmp/fineweb_demo

On a cluster, submit the same file via spark-submit --py-files (the reader
accepts s3a:// / hdfs:// paths through the Hadoop filesystem layer).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def run(spark: SparkSession, out_dir: str, n_generate: int = 0, input_path: str | None = None) -> dict:
    from pyspark.sql import functions as F

    from datatrove_spark.operators import minhash, token_stats
    from datatrove_spark.plans.pipeline import canonical_stages, kept, run_pipeline
    from datatrove_spark.sources.pages import generate_pages

    if n_generate:
        df = generate_pages(spark, n_generate)
    else:
        df = spark.read.parquet(input_path)

    # phase 1: base processing (url filter -> langid -> quality -> PII),
    # one pass, keep-partitioned sink + per-reason metrics
    base_dir = os.path.join(out_dir, "base_processing")
    metrics = run_pipeline(spark, df, canonical_stages(), base_dir)

    # phase 2: minhash dedup over the kept docs (the reference's 4 stages —
    # signatures / buckets / cluster / filter — collapse into one operator:
    # signature explode -> bucket groupBy -> star edges -> components)
    curated = kept(spark, base_dir).withColumn("doc_id", F.monotonically_increasing_id())
    deduped = minhash.apply(curated).filter("minhash_keep").drop("dup_of", "minhash_keep")

    # phase 3: token counting stat on the final corpus (reference TokensCounter)
    final = token_stats.with_token_count(deduped)
    final_dir = os.path.join(out_dir, "deduped")
    final.write.mode("overwrite").parquet(final_dir)
    n_final = spark.read.parquet(final_dir).count()
    metrics["deduped_docs"] = n_final
    return metrics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--generate", type=int, default=0, help="generate N synthetic pages instead")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    if not (args.input or args.generate):
        ap.error("one of --input / --generate is required")

    from datatrove_spark import get_spark

    spark = get_spark(app_name="fineweb-example")
    metrics = run(spark, args.output, args.generate, args.input)
    print(metrics)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
