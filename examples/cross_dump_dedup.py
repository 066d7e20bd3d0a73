"""Cross-dump deduplication — the FineWeb production workflow the reference
serves with MinhashDedupBuckets(index_folder=..., only_dedup_in_index=True,
create_index_name=...) (src/datatrove/pipeline/dedup/minhash.py:253-283):
each new Common-Crawl dump is deduplicated against the signature index of
everything already kept, then its own surviving signatures extend the index
for the next dump.

Spark-first shape: the index is a parquet table of bare (bucket_id, sig)
band keys (exactly the reference's .minhash.index content — no doc ids);
each dump runs ONE adaptive membership semi-join against it plus the usual
in-dump dedup, and the next index is the distinct union of the old index
with the survivors' signatures. Writing the index bucketed by the band key
co-locates every later dump's join.

    python examples/cross_dump_dedup.py --output /tmp/xdump_demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, input_path: str, out_dir: str, n_dumps: int = 3) -> dict:
    from datatrove_spark.operators import minhash

    docs = spark.read.parquet(input_path)
    # stand-in for successive CC dumps: deterministic doc_id striping
    dumps = [docs.filter(F.col("doc_id") % n_dumps == i) for i in range(n_dumps)]

    stats = {}
    # Versioned index paths: dump i reads index_v{i}, writes index_v{i+1}.
    # A crash mid-write never touches the live version (the reader of v{i}
    # simply reruns), and no read-back copy pass or in-place swap is needed.
    index_v = lambda i: os.path.join(out_dir, f"index_v{i:02d}")  # noqa: E731
    for i, dump in enumerate(dumps):
        if i == 0:
            # first dump: plain in-dump dedup, then bootstrap the index
            kept = minhash.apply(dump).filter("minhash_keep").drop("dup_of", "minhash_keep")
        else:
            index = spark.read.parquet(index_v(i))
            deduped = minhash.apply_with_index(
                dump, index, only_dedup_in_index=False
            )
            kept = deduped.filter("minhash_keep").drop(
                "index_match", "dup_of", "minhash_keep"
            )
        kept.write.mode("overwrite").parquet(os.path.join(out_dir, f"dump_{i:02d}"))
        kept = spark.read.parquet(os.path.join(out_dir, f"dump_{i:02d}"))
        # extend the index with the survivors' signatures (distinct union =
        # the reference's create_index_name append, relationally)
        new_index = minhash.build_index(kept)
        if i > 0:
            new_index = spark.read.parquet(index_v(i)).union(new_index).distinct()
        new_index.write.mode("overwrite").parquet(index_v(i + 1))
        stats[f"dump_{i}"] = {"in": dump.count(), "kept": kept.count()}
        # apply_with_index (full mode) persists the dump's signature table so
        # the corpus text scans once; drop it before the next dump iteration
        # so a long multi-dump loop doesn't accumulate cached tables
        spark.catalog.clearCache()
    stats["index_rows"] = spark.read.parquet(index_v(n_dumps)).count()
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001/documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--dumps", type=int, default=3)
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="cross-dump-dedup-example")
    print(run(spark, args.input, args.output, args.dumps))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
