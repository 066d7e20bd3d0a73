"""Reader/writer round-trips (reference test style: test_parquet_reader.py,
test_adapter_reader.py, test_ipc_reader.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datatrove_spark.sources import readers
from datatrove_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, 80).select("url", "text", "lang").localCheckpoint(eager=True)


def test_jsonl_roundtrip(spark, pages, tmp_path):
    p = str(tmp_path / "out_jsonl")
    readers.write_jsonl(pages, p)
    back = readers.read_jsonl(spark, p)
    assert sorted(map(tuple, back.select("url", "text", "lang").collect())) == sorted(
        map(tuple, pages.collect())
    )
    # gzip codec actually applied
    import glob

    assert glob.glob(f"{p}/*.json.gz")


def test_jsonl_adapter_and_limit(spark, pages, tmp_path):
    p = str(tmp_path / "out_jsonl2")
    readers.write_jsonl(pages, p)
    back = readers.read_jsonl(spark, p, column_map={"text": "content"}, limit=10)
    assert "content" in back.columns and "text" not in back.columns
    assert back.count() == 10


def test_csv_roundtrip(spark, pages, tmp_path):
    p = str(tmp_path / "out_csv")
    safe = pages.select("url", "lang")  # text may contain newlines
    safe.write.mode("overwrite").csv(p, header=True)
    back = readers.read_csv(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, safe.collect()))


def test_parquet_pruned_columns_reach_scan(spark, pages, tmp_path):
    p = str(tmp_path / "out_parq")
    readers.write_parquet(pages, p, partition_by=["lang"], max_records_per_file=20)
    back = readers.read_parquet(spark, p, columns=["url"])
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<url:string>" in plan
    assert back.count() == 80
    # rolling files: no data file exceeds max_records_per_file
    import glob

    for f in glob.glob(f"{p}/lang=*/*.parquet"):
        import pyarrow.parquet as pq

        assert pq.read_metadata(f).num_rows <= 20


def test_ipc_reader(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    path = str(tmp_path / "side_input.arrow")
    table = pa.table({"word": ["alpha", "beta"], "weight": [1.5, 2.5]})
    with ipc.new_file(path, table.schema) as w:
        w.write_table(table)
    df = readers.read_ipc(spark, path)
    assert sorted(map(tuple, df.collect())) == [("alpha", 1.5), ("beta", 2.5)]


def test_table_refs(spark, tmp_path):
    """Table-reference dispatch: parquet path round-trips; iceberg refs are
    jar-gated with an actionable error (or work, if a jar is present)."""
    from datatrove_spark.sources import tables

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    ref = f"parquet:{tmp_path}/t"
    tables.write_table(df, ref, partition_by=["v"])
    back = tables.read_table(spark, ref, columns=["id"])
    assert back.columns == ["id"]
    assert sorted(r.id for r in tables.read_table(spark, ref).collect()) == [1, 2]

    # session-catalog tables work without any extra jar (unique name: a
    # previous session's managed-table location would otherwise collide)
    import uuid

    tname = f"tmp_tables_{uuid.uuid4().hex[:12]}"
    df.write.saveAsTable(tname)
    try:
        assert tables.read_table(spark, f"table:{tname}").count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tname}")

    if not tables.iceberg_available(spark):
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            tables.read_table(spark, "iceberg:cat.db.pages")
    else:  # pragma: no cover — only with the runtime jar installed
        assert tables.read_table(spark, "iceberg:cat.db.pages") is not None
