"""HF dataset bridge: hub-parquet-export and save_to_disk round trips.

The save_to_disk fixture is built with raw pyarrow IPC (the exact bytes
``datasets`` writes) so read_hf_saved is tested against the real layout
without the ``datasets`` wheel.
"""

from __future__ import annotations

import os

from datatrove_spark.sources import hf_bridge

ROWS = [(i, f"document number {i}", float(i) / 7) for i in range(100)]
SCHEMA = "doc_id long, text string, score double"


def test_export_round_trip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(4)
    shards = hf_bridge.write_hf_export(df, str(tmp_path), max_records_per_file=30)
    names = [os.path.basename(s) for s in shards]
    n = len(names)
    assert names == [f"train-{i:05d}-of-{n:05d}.parquet" for i in range(n)]
    assert n >= 4  # maxRecordsPerFile(30) over 100 rows in 4 partitions

    back = hf_bridge.read_hf_export(spark, str(tmp_path))
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)
    # pruning + rename + limit plumbing
    two = hf_bridge.read_hf_export(
        spark, str(tmp_path), columns=["doc_id", "text"], column_map={"text": "body"}, limit=5
    )
    assert two.columns == ["doc_id", "body"]
    assert two.count() == 5


def test_read_hf_saved_layout(spark, tmp_path):
    # build a save_to_disk-shaped dir with raw pyarrow (2 IPC stream shards)
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = pa.table(
        {
            "doc_id": pa.array([i for i, _, _ in ROWS], pa.int64()),
            "text": pa.array([t for _, t, _ in ROWS]),
            "score": pa.array([s for _, _, s in ROWS], pa.float64()),
        }
    )
    for k, sl in enumerate((table.slice(0, 60), table.slice(60))):
        with open(tmp_path / f"data-{k:05d}-of-00002.arrow", "wb") as f, ipc.new_stream(
            f, table.schema
        ) as w:
            w.write_table(sl, max_chunksize=25)  # multiple record batches per shard

    df = hf_bridge.read_hf_saved(spark, str(tmp_path))
    assert df.columns == ["doc_id", "text", "score"]
    assert sorted(tuple(r) for r in df.collect()) == sorted(ROWS)


def test_saved_round_trip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    root = str(tmp_path / "ds")
    hf_bridge.write_hf_saved(df, root, shards=3)
    files = sorted(f for f in os.listdir(root) if f.endswith(".arrow"))
    assert files == [f"data-{i:05d}-of-00003.arrow" for i in range(3)]
    assert os.path.exists(os.path.join(root, "state.json"))

    back = hf_bridge.read_hf_saved(spark, root)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)
