"""Multilingual pretraining-data prep — the full beyond-reference stack
composed end-to-end: quality battery → minhash dedup → CCNet perplexity
tiers → temperature language rebalancing → tokenized .ds shards.

No single reference example covers this flow (the reference stops at
fineweb.py's curation + dedup); this is the remaining half of a real
multilingual pretraining pipeline as the CCNet / XLM-R / mC4 papers
describe it:

  0. language ID assigns each page its language (multilingual accept set);
  1. heuristic quality battery (fused Arrow kernel, one narrow pass) on the
     ENGLISH slice only — the gopher/c4/fineweb rules are English-calibrated
     and would wrongly drop other languages wholesale; non-English is gated
     by the LM tiers below instead (CCNet's own design);
  2. MinHash near-dup removal (one banded signature shuffle + components);
  3. CCNet head/middle/tail perplexity tiers per language (exact
     distributed ntile — no per-language single-task sort); tail dropped;
  4. temperature rebalancing q_l ∝ p_l^α (α=0.5): per-language budgeted
     sampling that upweights low-resource languages, zero corpus shuffle;
  5. deterministic doc shuffle → reference-layout .ds token shards.

Every stage is the registry-tested operator; the composition here is what
a migrating user would actually run.

    python examples/multilingual_pretrain_prep.py --output /tmp/ml_prep
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

EOS = 0


def run(
    spark: SparkSession,
    out_dir: str,
    n_generate: int = 0,
    input_path: str | None = None,
    alpha: float = 0.5,
    budget_frac: float = 0.6,
) -> dict:
    from pyspark.sql import functions as F

    from datatrove_spark.operators import (
        ccnet_buckets,
        lang_rebalance,
        langid,
        minhash,
        tokenizer,
    )
    from datatrove_spark.operators.dataset import check_dataset
    from datatrove_spark.registry import quality_pipeline
    from datatrove_spark.sources.pages import generate_pages

    from datatrove_spark.functions.hashing import hash60

    if n_generate:
        # materialize first: a real pipeline reads pages from storage, and the
        # generator's literal expression tree must not fuse with UDF stages
        pages_dir = os.path.join(out_dir, "pages")
        generate_pages(spark, n_generate).write.mode("overwrite").parquet(pages_dir)
        docs = spark.read.parquet(pages_dir)
    else:
        docs = spark.read.parquet(input_path)
    # deterministic doc id from the url (the pages table carries none)
    docs = docs.withColumn("doc_id", hash60(F.col("url"))).drop("html")
    n_in = docs.count()

    # 0) language ID assigns the `lang` column the later stages key on
    # (the raw pages `lang` is crawl metadata; langid's decision replaces
    # it) — multilingual accept set, unlike the en-only curation default
    from datatrove_spark.config import LangIdConfig

    li_cfg = LangIdConfig(languages=("en", "de", "fr", "es", "pt", "it", "nl"))
    docs = (
        langid.apply(docs, cfg=li_cfg)
        .filter("langid_keep")
        .drop("lang")
        .withColumn("lang", F.col("language"))
    )

    # 1) quality battery on the ENGLISH slice only — the gopher/c4/fineweb
    # rules are stopword/punctuation-calibrated for English and would
    # wrongly drop other languages wholesale; non-English docs are gated by
    # the LM perplexity tiers below instead, which is CCNet's own design
    en = (
        quality_pipeline(docs.filter(F.col("lang") == "en"))
        .filter("keep")
        .drop("text")
        .withColumnRenamed("final_text", "text")
        .drop("drop_reason", "keep")
    )
    q = en.unionByName(docs.filter(F.col("lang") != "en"))

    # 2) near-dup removal
    d = minhash.apply(q).filter("minhash_keep").drop("dup_of", "minhash_keep")

    # 3) CCNet tiers; drop the tail (least fluent third per language)
    b = ccnet_buckets.apply(d)
    hm = b.filter(F.col("ccnet_bucket") != "tail")

    # 4) temperature rebalancing under a token budget
    kept = (
        lang_rebalance.apply(hm, alpha=alpha, budget_frac=budget_frac)
        .filter("lang_rebalance_keep")
    )
    # materialize the curated corpus (also the resume point of a real run)
    corpus_dir = os.path.join(out_dir, "curated")
    kept.write.mode("overwrite").parquet(corpus_dir)
    curated = spark.read.parquet(corpus_dir)
    by_lang = {r["lang"]: r["count"] for r in curated.groupBy("lang").count().collect()}

    # 5) deterministic shuffle + reference-layout token shards
    shuffled = tokenizer.shuffled(curated, seed="ml-prep", partitions=4)
    ds_dir = os.path.join(out_dir, "tokenized")
    tokenizer.write_tokenized(shuffled, ds_dir, eos_token_id=EOS, save_loss=True)
    check_dataset(ds_dir, eos_token_id=EOS)  # raises on corruption
    shards = sorted(f for f in os.listdir(ds_dir) if f.endswith(".ds"))
    tokens = sum(os.path.getsize(os.path.join(ds_dir, s)) // 2 for s in shards)

    return {
        "docs_in": n_in,
        "docs_out": curated.count(),
        "kept_by_lang": by_lang,
        "shards": len(shards),
        "tokens": tokens,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="pages-shaped parquet; omit to generate")
    ap.add_argument("--generate", type=int, default=3000)
    ap.add_argument("--output", required=True)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--budget", type=float, default=0.6)
    args = ap.parse_args()

    from datatrove_spark import get_spark

    spark = get_spark(app_name="multilingual-pretrain-prep")
    print(
        run(
            spark,
            args.output,
            n_generate=0 if args.input else args.generate,
            input_path=args.input,
            alpha=args.alpha,
            budget_frac=args.budget,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
