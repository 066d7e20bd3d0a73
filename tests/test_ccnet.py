"""CCNet perplexity bucketing: distributed exact ntile semantics + plan.

Registry parity (test_registry_parity / check_correctness) already proves
ccnet_buckets matches the DuckDB ntile-window oracle value-for-value at
sf0.001/sf0.01; these tests pin what that comparison can't express: the
ntile size rule itself, skew behavior (one dominant language must not mean
one giant task), and the plan contract (no Window node, slim-columns-only
range shuffle, text never enters an exchange).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datatrove_spark.operators import ccnet_buckets
from tests.conftest import SF_SMALL


def test_sql_tile_formula():
    """First n % k tiles get one extra row (standard SQL ntile)."""
    # n=10, k=3 -> sizes 4,3,3
    got = [ccnet_buckets.sql_tile(r, 10, 3) for r in range(1, 11)]
    assert got == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    # n < k: first n tiles get one row each
    assert [ccnet_buckets.sql_tile(r, 2, 3) for r in (1, 2)] == [1, 2]
    # exact division
    assert [ccnet_buckets.sql_tile(r, 6, 3) for r in range(1, 7)] == [1, 1, 2, 2, 3, 3]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_tiles_match_local_ntile_under_skew(spark, docs):
    """95% of docs forced into ONE language (the web-corpus English case):
    the distributed rank must still reproduce the exact per-language ntile
    computed locally over the collected (lang, ppl, id) order."""
    skewed = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 20 == 0, F.col("lang")).otherwise(F.lit("en"))
    )
    out = ccnet_buckets.apply(skewed)
    rows = out.select("doc_id", "lang", "ngram_perplexity", "ccnet_tile").collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r.ngram_perplexity, r.doc_id))
        n = len(rs)
        for i, r in enumerate(rs, start=1):
            assert r.ccnet_tile == ccnet_buckets.sql_tile(i, n, 3), (lang, i, r)


def test_null_lang_fails_fast(spark, docs):
    """NULL languages must raise a clear error, never silently mislabel
    (the vectorized kernel's factorize would lose None's dict-key identity)."""
    nulled = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang"))
    )
    with pytest.raises(ValueError, match="NULL lang"):
        ccnet_buckets.apply(nulled).collect()


def test_bucket_names_and_head_is_most_fluent(spark, docs):
    out = ccnet_buckets.apply(docs).select("lang", "ngram_perplexity", "ccnet_bucket")
    rows = out.collect()
    assert {r.ccnet_bucket for r in rows} == {"head", "middle", "tail"}
    for lang in {r.lang for r in rows}:
        rs = [r for r in rows if r.lang == lang]
        heads = [r.ngram_perplexity for r in rs if r.ccnet_bucket == "head"]
        tails = [r.ngram_perplexity for r in rs if r.ccnet_bucket == "tail"]
        assert max(heads) <= min(tails)  # head = lowest perplexity tier


def test_plan_no_window_and_text_never_shuffles(spark, docs):
    """The scale contract: no ntile/per-language Window (the textbook form
    would sort each whole language on one task — the only Window allowed is
    ngram_lm's documented whole-table fold over the CAPPED vocab), and no
    Exchange carries the text column — only the slim (lang, ppl, id)
    projection range-shuffles."""
    import re

    df = ccnet_buckets.apply(docs)
    df.collect()
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ntile" not in p.lower(), p
    # any Window node must be ngram_lm's vocab-total fold — never partitioned
    # or ordered by language/perplexity
    for m in re.finditer(r"\(\d+\) Window\nInput.*\nArguments: \[([^\n]*)\]", p):
        assert "lang" not in m.group(1) and "perplexity" not in m.group(1), m.group(1)
    assert "rangepartitioning(__lang" in p, p
    for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", p):
        assert "text" not in m.group(1), m.group(1)
