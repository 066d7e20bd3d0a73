"""Temperature language rebalancing: rate math, flattening, determinism.

Registry parity already proves the keep column matches the DuckDB oracle
bit-for-bit at sf0.001/sf0.01; these pin the semantics the hash comparison
can't express."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datatrove_spark.operators import lang_rebalance
from tests.conftest import SF_SMALL


def test_rates_flatten_toward_low_resource():
    """alpha=0.5 upweights rare languages: the rare language's keep rate must
    exceed the dominant one's, expected totals must respect the budget, and a
    language below its target keeps everything (rate capped at 1)."""
    counts = {"en": 90_000, "sw": 100, "de": 30_000}
    rates = lang_rebalance.rates_from_counts(counts, alpha=0.5, budget_frac=0.5)
    assert rates["sw"] == 1.0  # below target -> keep all
    assert rates["sw"] > rates["de"] > rates["en"]
    # expected kept proportions (excluding capped langs) follow sqrt weights
    assert rates["de"] / rates["en"] == pytest.approx(
        math.sqrt(counts["en"] / counts["de"]), rel=1e-12
    )
    expected_total = sum(rates[lg] * counts[lg] for lg in counts)
    assert expected_total <= 0.5 * sum(counts.values()) + 1e-6


def test_keep_is_partition_independent(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = {r.doc_id: r.lang_rebalance_keep for r in lang_rebalance.apply(docs).collect()}
    b = {
        r.doc_id: r.lang_rebalance_keep
        for r in lang_rebalance.apply(docs.repartition(17)).collect()
    }
    assert a == b
    assert any(a.values()) and not all(a.values())


def test_realized_counts_near_expected(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    counts = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    rates = lang_rebalance.rates_from_counts(counts)
    kept = {
        r.lang: r["count"]
        for r in lang_rebalance.apply(docs)
        .filter("lang_rebalance_keep")
        .groupBy("lang")
        .count()
        .collect()
    }
    for lg, n in counts.items():
        exp = rates[lg] * n
        # h60 is uniform; at 100-ish docs/lang allow generous binomial slack
        assert abs(kept.get(lg, 0) - exp) <= 4 * math.sqrt(max(exp, 1)) + 2, (lg, exp, kept)


def test_plan_is_narrow_after_tiny_agg(spark):
    """The corpus-side keep rule is a pure narrow filter: literal thresholds,
    no join, no corpus shuffle (the only aggregation is the per-language
    count that was collected driver-side before this plan was built)."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    df = lang_rebalance.apply(docs)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    p = buf.getvalue()
    assert "Exchange" not in p, p
    assert "Join" not in p, p
