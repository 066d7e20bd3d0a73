"""Hugging Face dataset bridge — parquet-export writer + distributed readers.

Reference: HuggingFaceDatasetReader (src/datatrove/pipeline/readers/
huggingface.py:10,83+) streams a hub dataset sharded by
``split_dataset_by_node``; HuggingFaceDatasetWriter (writers/huggingface.py:
24) uploads parquet shards to the hub. Neither the ``datasets`` wheel nor
network access exists in this environment, so the bridge speaks the two
at-rest layouts every HF dataset reduces to, with pyarrow only:

- **hub parquet export** (what the writer uploads and ``load_dataset`` can
  read directly): ``{root}/data/{split}-00000-of-0000N.parquet``.
  ``write_hf_export`` produces it from a DataFrame — a normal distributed
  parquet write, then a driver-side metadata rename to the HF shard naming
  (same shape as the reference writer's per-rank shard uploads,
  huggingface.py:79-105). ``read_hf_export`` is a plain pruned/pushed-down
  parquet scan.
- **datasets.save_to_disk layout** (``data-00000-of-0000N.arrow`` Arrow IPC
  stream files + json metadata): ``read_hf_saved`` reads it DISTRIBUTED —
  binaryFile rows fan the shard list across executors (the Spark rendering
  of the reference's [rank::world_size] file striping, io.py:160-173) and
  mapInPandas decodes each shard's record batches with pyarrow.ipc. Arrow
  IPC shards are not block-splittable, so parallelism is per-file — the
  same granularity the reference has; convert to parquet for finer splits.

The actual hub round-trip (push/stream) stays out of scope: it needs
network + hub auth; these layouts are byte-compatible with it.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from datatrove_spark.sources.readers import _adapt


def write_hf_export(
    df: DataFrame,
    root: str,
    split: str = "train",
    max_records_per_file: int | None = None,
) -> list[str]:
    """Distributed parquet write in the hub export layout; returns shard
    paths. The rename pass is driver-side metadata only (no data moves).

    The shard rename uses posix os.replace, so the output root must be
    driver-local storage — validated UP FRONT so a remote URI fails before
    the (expensive) distributed write, not after it."""
    if "://" in root and not root.startswith("file://"):
        raise ValueError(
            f"write_hf_export renames shards with driver-local os.replace; got remote "
            f"root {root!r}. Write with df.write.parquet(...) directly for remote "
            "storage, or export to a local path and upload the shards."
        )
    root = root.removeprefix("file://")
    data_dir = os.path.join(root, "data")
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(data_dir)
    parts = sorted(
        f for f in os.listdir(data_dir) if f.endswith(".parquet") and not f.startswith("_")
    )
    n = len(parts)
    shards = []
    for i, part in enumerate(parts):
        shard = f"{split}-{i:05d}-of-{n:05d}.parquet"
        os.replace(os.path.join(data_dir, part), os.path.join(data_dir, shard))
        shards.append(os.path.join(data_dir, shard))
    with open(os.path.join(root, "dataset_info.json"), "w", encoding="utf-8") as f:
        json.dump({"splits": {split: {"num_shards": n}}}, f)
    return shards


def read_hf_export(
    spark: SparkSession,
    root: str,
    split: str = "train",
    columns: list[str] | None = None,
    column_map: dict[str, str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Pruned parquet scan over a hub-style export (also reads exports made
    by the real HuggingFaceDatasetWriter, which uses the same layout)."""
    df = spark.read.parquet(os.path.join(root, "data", f"{split}-*.parquet"))
    if columns:
        df = df.select(*columns)
    return _adapt(df, column_map, limit)


def read_hf_saved(
    spark: SparkSession,
    root: str,
    column_map: dict[str, str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Distributed reader for a ``datasets.save_to_disk`` directory (Arrow
    IPC stream shards). Schema comes from the first shard (driver, reads
    only the stream header + first batch); shard decode fans out per file."""
    import pyarrow.ipc as ipc
    from pyspark.sql.pandas.types import from_arrow_schema

    shard_glob = os.path.join(root, "*.arrow")
    first = sorted(
        f for f in os.listdir(root) if f.endswith(".arrow")
    )
    if not first:
        raise FileNotFoundError(f"no .arrow shards under {root}")
    with open(os.path.join(root, first[0]), "rb") as f:
        schema = ipc.open_stream(f).schema
    spark_schema = from_arrow_schema(schema)

    files = spark.read.format("binaryFile").load(shard_glob).select("path", "content")

    def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import pyarrow.ipc as ipc_

        for pdf in pdfs:
            for content in pdf["content"]:
                reader = ipc_.open_stream(io.BytesIO(content))
                for batch in reader:
                    yield batch.to_pandas()

    df = files.mapInPandas(decode, spark_schema)
    return _adapt(df, column_map, limit)


def write_hf_saved(df: DataFrame, root: str, shards: int | None = None) -> None:
    """Produce a ``save_to_disk``-shaped directory (Arrow IPC stream shards +
    state.json) from a DataFrame — executors each write their partition as
    one shard via mapInPandas (no driver materialization). ``root`` must be
    storage all executors can reach (shared fs / fuse mount), like any
    distributed sink."""
    os.makedirs(root, exist_ok=True)
    if shards:
        df = df.repartition(shards)
    n = df.rdd.getNumPartitions()

    schema_holder = df.schema

    def write_part(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa_
        import pyarrow.ipc as ipc_
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        pid = TaskContext.get().partitionId()
        arrow_schema = to_arrow_schema(schema_holder)
        path = os.path.join(root, f"data-{pid:05d}-of-{n:05d}.arrow")
        with open(path, "wb") as f, ipc_.new_stream(f, arrow_schema) as w:
            rows = 0
            for pdf in pdfs:
                if len(pdf):
                    w.write_table(pa_.Table.from_pandas(pdf, schema=arrow_schema))
                    rows += len(pdf)
        yield pd.DataFrame({"shard": [path], "rows": [rows]})

    manifest = df.mapInPandas(write_part, "shard string, rows long").collect()
    with open(os.path.join(root, "state.json"), "w", encoding="utf-8") as f:
        json.dump(
            {"_data_files": [{"filename": os.path.basename(r.shard)} for r in manifest]},
            f,
        )
