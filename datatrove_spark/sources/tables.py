"""Table references — the Iceberg-first input/output surface.

The north rule's corpus lives in Iceberg ("read Iceberg tables of
Common-Crawl-style pages ... checkpoints ... to Iceberg"); this sandbox has
no iceberg-spark-runtime jar, so the engine speaks *table references* and
dispatches:

    iceberg:cat.db.pages   -> spark.read.table / df.writeTo(...).append()
    table:name             -> session-catalog table (spark.read.table)
    parquet:/path, /path   -> parquet scan / write (the tested local path)

Everything downstream (operators, pipeline, bench) is source-agnostic —
Catalyst pushes the same pruning/filters into an Iceberg scan as into a
parquet scan, and partitionBy maps to ``partitionedBy`` on ``writeTo``.

Production Iceberg session config (standard, from the Iceberg docs):

    spark.sql.extensions = org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
    spark.sql.catalog.cat = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.cat.type = hive | hadoop | rest
    --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>

Resume with Iceberg replaces the _SUCCESS markers in plans/pipeline.py with
snapshot checks: each shard commits one append (atomic snapshot); a re-run
lists snapshots' ``shard`` summary property and skips committed ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 — jar absent
        return False


def _split(ref: str) -> tuple[str, str]:
    for scheme in ("iceberg", "table", "parquet"):
        if ref.startswith(scheme + ":"):
            return scheme, ref[len(scheme) + 1 :]
    return "parquet", ref  # bare path


def read_table(spark: SparkSession, ref: str, columns: list[str] | None = None) -> DataFrame:
    scheme, target = _split(ref)
    if scheme == "iceberg" and not iceberg_available(spark):
        raise RuntimeError(
            f"{ref!r} needs the iceberg-spark-runtime jar on the classpath "
            "(see datatrove_spark/sources/tables.py docstring); locally, "
            "point the ref at parquet instead."
        )
    df = (
        spark.read.table(target)
        if scheme in ("iceberg", "table")
        else spark.read.parquet(target)
    )
    if columns:
        df = df.select(*columns)  # pruning reaches either scan via Catalyst
    return df


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    scheme, target = _split(ref)
    if scheme in ("iceberg", "table"):
        if scheme == "iceberg" and not iceberg_available(df.sparkSession):
            raise RuntimeError(f"{ref!r} needs the iceberg-spark-runtime jar")
        from pyspark.sql.functions import col

        w = df.writeTo(target)
        if partition_by:
            w = w.partitionedBy(*[col(c) for c in partition_by])
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
