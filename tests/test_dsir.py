"""DSIR importance weighting: selection semantics, partition-independence,
plan shape. Registry parity (test_registry_parity) covers the byte-exact
DuckDB oracle match for both queries."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datatrove_spark.operators import dsir
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_selection_skews_toward_target(spark, docs):
    """Top-k by importance score must be enriched in the target domain
    relative to the corpus base rate — the whole point of the method."""
    top = dsir.select_topk(docs, target="lang = 'en'", k=100)
    frac_top = top.join(docs, "doc_id").filter("lang = 'en'").count() / 100
    frac_all = docs.filter("lang = 'en'").count() / docs.count()
    assert frac_top > frac_all + 0.1, (frac_top, frac_all)


def test_scores_partition_independent(spark, docs):
    """Integer-micro quantization makes the per-doc sum addition-order-free:
    scores must be identical at any parallelism."""
    a = sorted(map(tuple, dsir.scores(docs.repartition(2), "lang = 'en'").collect()))
    b = sorted(map(tuple, dsir.scores(docs.repartition(17), "lang = 'en'").collect()))
    assert a == b and len(a) == docs.count()


def test_target_docs_score_higher_on_average(docs):
    """Mean importance of target-domain docs must exceed non-target mean."""
    s = dsir.scores(docs, "lang = 'en'").join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["t"]: r["m"]
        for r in s.groupBy((F.col("lang") == "en").alias("t"))
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_kernel_features():
    assert dsir.py_gram_buckets(None) == []
    assert dsir.py_gram_buckets("") == []
    one = dsir.py_gram_buckets("hello")
    assert len(one) == 1  # one unigram, no bigram
    # "a b" -> unigrams a, b + bigram "a b"; counts carry multiplicity
    assert len(dsir.py_gram_buckets("a b")) == 3
    assert len(dsir.py_gram_buckets("a a a")) == 5
    assert all(0 <= b < dsir.DEFAULT_BUCKETS for b in dsir.py_gram_buckets("x y z"))


def test_plan_shape(docs):
    """Scoring joins the bounded weight table as a broadcast; both kernel
    passes are Arrow (model + scoring — the documented ngram_lm-style double
    scan, never more); top-k plans as TakeOrdered, not a global sort or a
    single-partition window."""
    p = dsir.scores(docs, "lang = 'en'")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert p.count("ArrowEvalPython") == 2, p
    pk = (
        dsir.select_topk(docs, "lang = 'en'", k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in pk, pk
