"""Readers & writers — the reference's I/O surface as spark.read/df.write.

Reference readers share BaseDiskReader (src/datatrove/pipeline/readers/
base.py:101-241): fsspec folder + [rank::world_size] file striping, limit/
skip, an adapter fn (raw dict -> Document) and text/id key remapping.
Writers share DiskWriter (pipeline/writers/disk_base.py:15-177): templated
output filenames (= dynamic partitioned write), max_file_size rolling, and
metadata expansion.

Spark equivalences implemented here:
  JsonlReader   (readers/jsonl.py)   -> spark.read.json (codec inferred)
  CsvReader     (readers/csv.py)     -> spark.read.csv(header=True)
  ParquetReader (readers/parquet.py) -> spark.read.parquet; column pruning
                                        is Catalyst's job (read_metadata=False
                                        == select narrow columns)
  IpcReader     (readers/ipc.py)     -> pyarrow IPC -> createDataFrame
  JsonlWriter   (writers/jsonl.py)   -> df.write.json(compression=gzip)
  ParquetWriter (writers/parquet.py) -> df.write.parquet with
                                        maxRecordsPerFile (5 GB rolling ->
                                        row-count rolling)
  ${metadata} filename templating    -> partitionBy(columns)

File striping / limit / skip are subsumed by Spark split planning and
df.limit/offset; the adapter is a select/withColumnRenamed projection.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession


def _adapt(df: DataFrame, column_map: Mapping[str, str] | None, limit: int | None) -> DataFrame:
    if column_map:
        for src, dst in column_map.items():
            df = df.withColumnRenamed(src, dst)
    if limit is not None:
        df = df.limit(limit)
    return df


def read_jsonl(
    spark: SparkSession,
    path: str,
    column_map: Mapping[str, str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Line-delimited JSON; gzip/zstd decoded automatically by extension."""
    return _adapt(spark.read.json(path), column_map, limit)


def read_csv(
    spark: SparkSession,
    path: str,
    column_map: Mapping[str, str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    return _adapt(spark.read.csv(path, header=True, inferSchema=True), column_map, limit)


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    column_map: Mapping[str, str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)  # pruning reaches the scan via Catalyst
    return _adapt(df, column_map, limit)


def read_ipc(
    spark: SparkSession,
    path: str,
    column_map: Mapping[str, str] | None = None,
    limit: int | None = None,
    max_bytes: int = 512 << 20,
) -> DataFrame:
    """Arrow IPC file — driver-side pyarrow read, Arrow-native conversion.
    Suitable for side inputs (blocklists, eval sets); the size guard keeps
    anyone from pointing it at a corpus — large data should land as parquet
    or go through sources.hf_bridge.read_hf_saved (distributed IPC)."""
    import os

    import pyarrow as pa
    import pyarrow.ipc as ipc

    size = os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"read_ipc is a DRIVER-side side-input reader; {path} is "
            f"{size >> 20} MiB (> {max_bytes >> 20} MiB). Convert to parquet "
            "or use hf_bridge.read_hf_saved for distributed IPC decode."
        )
    with pa.memory_map(path) as source:
        table = ipc.open_file(source).read_all()
    df = spark.createDataFrame(table.to_pandas())
    return _adapt(df, column_map, limit)


def write_jsonl(df: DataFrame, path: str, compression: str = "gzip", partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
