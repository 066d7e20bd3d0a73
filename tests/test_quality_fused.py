"""Fused kernel == composed native plan on the generated pages corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from datatrove_spark.registry import quality_pipeline, quality_pipeline_native
from datatrove_spark.sources.pages import generate_pages


def test_fused_equals_native(spark):
    # materialize: a pandas UDF directly over the generator's expression tree
    # trips a Spark 4.1 interpreted-eval internal error (also the reason
    # bench.py stages generated pages through parquet)
    pages = generate_pages(spark, 600).localCheckpoint(eager=True)
    fused = {
        r.url: (r.keep, r.drop_reason, r.final_text)
        for r in quality_pipeline(pages).select("url", "keep", "drop_reason", "final_text").collect()
    }
    native = {
        r.url: (r.keep, r.drop_reason, r.text)
        for r in quality_pipeline_native(pages)
        .select("url", "keep", "drop_reason", "text")
        .collect()
    }
    assert set(fused) == set(native)
    for url, (k, rsn, txt) in fused.items():
        nk, nrsn, ntxt = native[url]
        assert (k, rsn) == (nk, nrsn), url
        if k:  # kept docs must have byte-identical rewritten text
            assert txt == ntxt, url
