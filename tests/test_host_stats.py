"""Salted host aggregation == unsalted ground truth, incl. the generator's
built-in hot-host skew."""

from __future__ import annotations

import pyspark.sql.functions as F

from datatrove_spark.functions import text as T
from datatrove_spark.operators import host_stats
from datatrove_spark.sources.pages import generate_pages


def test_salted_equals_unsalted(spark):
    pages = generate_pages(spark, 2000).localCheckpoint(eager=True)
    salted = {r.host: (r.n_docs, r.n_urls, r.total_tokens) for r in host_stats.apply(pages).collect()}
    plain = {
        r.host: (r.n_docs, r.n_urls, r.total_tokens)
        for r in pages.select(
            host_stats.host_of(F.col("url")).alias("host"),
            F.col("url"),
            T.token_count(F.col("text")).alias("t"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("url").alias("n_urls"),
            F.sum("t").alias("total_tokens"),
        )
        .collect()
    }
    assert salted == plain
    # the generator's deliberate skew is visible: hot host dominates
    top = max(salted.items(), key=lambda kv: kv[1][0])
    assert top[0] == "hot-host-0.example.com"
    assert top[1][0] > 100


def test_topk(spark):
    pages = generate_pages(spark, 1000).localCheckpoint(eager=True)
    rows = host_stats.topk(pages, k=3).collect()
    assert len(rows) == 3
    assert rows[0].host == "hot-host-0.example.com"
    assert rows[0].n_docs >= rows[1].n_docs >= rows[2].n_docs
