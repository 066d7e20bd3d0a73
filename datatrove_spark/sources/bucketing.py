"""Bucketed (co-located) storage — shuffle-free joins for repeated keys.

The reference re-reads and re-partitions between every dedup job (its
"shuffle" is sorted files on disk, SURVEY.md §3.4). The Spark-native
equivalent for *recurring* joins on a stable key (doc_id joins between a
corpus and its signatures / scores / dedup verdicts at every pipeline run)
is bucketed tables: both sides pre-hash-partitioned AND pre-sorted on the
join key at write time, so every later sort-merge join runs with NO
Exchange and NO Sort — at 100 TB that deletes the dominant all-to-all
network step from every incremental run.

``spark.write.bucketBy`` requires the session catalog (`saveAsTable`);
bucket counts must match on both sides for co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "doc_id",
    buckets: int = 16,
    sort: bool = True,
) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "doc_id", how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    sort-merge join with zero Exchange (asserted in tests/test_bucketing.py).

    The merge hint pins the strategy: at test scale the optimizer would
    rather broadcast the small side (which bypasses bucketing entirely); at
    the real corpus scale both sides exceed any broadcast threshold and
    sort-merge-over-buckets is the plan we are locking in."""
    return (
        spark.table(left_table).hint("merge").join(spark.table(right_table).hint("merge"), key, how)
    )
