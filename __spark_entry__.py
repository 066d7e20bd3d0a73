"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``datatrove_spark.registry`` — the query registry is
package code so pytest exercises exactly what the driver runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datatrove_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the end-to-end curation flow (URL filter -> language
    ID -> FineWeb-order quality battery -> PII scrub) over the sf0.001
    documents table — per document: language, first drop reason in stage
    order, keep decision, and the curated (rewritten + scrubbed) text."""
    fn = registry.queries()["curation_pipeline"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
