"""URL dedup index mode: intended-semantics tests (the reference's own url
index mode is dead code — see apply_with_index docstring for the bug cite)."""

from __future__ import annotations

import pandas as pd
import pytest

from datatrove_spark.operators import url_dedup


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "url": [
                    "https://a.com/x",      # indexed
                    "http://www.a.com/x/",  # same normalized url -> indexed
                    "https://b.com/y",      # clean group of two
                    "https://B.com/y/",
                    "https://c.com/z",      # clean singleton
                ],
                "prio": [1, 9, 1, 9, 1],
            }
        ).astype({"doc_id": "int64", "prio": "int64"})
    )


@pytest.fixture(scope="module")
def prior_index(spark):
    prior = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "url": ["A.COM/x"]}).astype({"doc_id": "int64"})
    )
    return url_dedup.build_index(prior)


def test_true_mode_removes_all_indexed_urls(spark, corpus, prior_index):
    out = {
        r.doc_id: r
        for r in url_dedup.apply_with_index(
            corpus, prior_index, priority_col="prio", only_dedup_in_index=True
        ).collect()
    }
    # every copy of the indexed url is redundant (canonical copy is indexed)
    assert out[1].index_match and not out[1].url_dedup_keep
    assert out[2].index_match and not out[2].url_dedup_keep
    # non-indexed docs untouched in True mode — even self-duplicates survive
    assert out[3].url_dedup_keep and out[4].url_dedup_keep and out[5].url_dedup_keep
    assert not out[3].index_match


def test_full_mode_also_self_dedups_clean_groups(spark, corpus, prior_index):
    out = {
        r.doc_id: r
        for r in url_dedup.apply_with_index(
            corpus, prior_index, priority_col="prio", only_dedup_in_index=False
        ).collect()
    }
    assert not out[1].url_dedup_keep and not out[2].url_dedup_keep  # indexed
    # clean group keeps the highest-priority doc (doc 4, prio 9)
    assert not out[3].url_dedup_keep and out[4].url_dedup_keep
    assert out[5].url_dedup_keep


def test_build_index_distinct_and_bare(spark):
    prior = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "url": ["https://a.com/x", "http://WWW.a.com/x/"]}
        ).astype({"doc_id": "int64"})
    )
    rows = url_dedup.build_index(prior).collect()
    assert len(rows) == 1  # same normalized url -> one hash
    assert set(rows[0].asDict()) == {"h"}
