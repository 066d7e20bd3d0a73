"""Bucketed co-located joins: the join of two same-bucketed tables must plan
with ZERO Exchange (the scale contract that makes recurring doc_id joins
shuffle-free at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datatrove_spark.sources.bucketing import colocated_join, write_bucketed
from tests.conftest import SF_SMALL
from tests.test_plan_shape import plan_of


@pytest.fixture(scope="module")
def bucketed(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    write_bucketed(docs.select("doc_id", "text"), "b_docs", buckets=8)
    write_bucketed(
        docs.select("doc_id", F.length("text").alias("score")), "b_scores", buckets=8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_scores")


def test_colocated_join_has_no_exchange(spark, bucketed):
    joined = colocated_join(spark, "b_docs", "b_scores")
    plan = plan_of(joined, mode="simple")
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan  # co-located: no shuffle on either side
    assert joined.count() == spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()


def test_unbucketed_join_needs_exchange(spark, bucketed):
    """Control: the same join against a raw parquet side must shuffle —
    proving the bucketed layout (not the data size) removes the Exchange."""
    raw = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "lang")
    plan = plan_of(spark.table("b_docs").join(raw, "doc_id"), mode="simple")
    assert "Exchange" in plan or "Broadcast" in plan, plan
