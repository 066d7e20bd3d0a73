"""Tokenizer sink (SURVEY §2.8): binary shard round-trip, format parity
with the reference's TokenizedFile layout, deterministic shuffle."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from datatrove_spark.operators import tokenizer
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")


def test_native_ids_match_python(spark, docs):
    got = {r.doc_id: r.token_ids for r in tokenizer.with_token_ids(docs).collect()}
    for r in docs.collect():
        assert got[r.doc_id] == tokenizer.py_token_ids(r.text), r.doc_id


def test_binary_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "ds")
    tokenizer.write_tokenized(docs.repartition(3), out)
    back = tokenizer.read_tokenized(out)
    expected = [tokenizer.py_token_ids(r.text) for r in docs.collect()]
    # partitioning decides shard assignment -> compare as multisets of docs
    assert sorted(map(tuple, back)) == sorted(map(tuple, expected))
    assert len(back) == docs.count()


def test_index_matches_reference_layout(spark, docs, tmp_path):
    """The .index companion is little-endian uint64 cumulative doc ends —
    the exact struct the reference writes (tokenizer.py:79-81)."""
    out = str(tmp_path / "ds1")
    tokenizer.write_tokenized(docs.coalesce(1), out)
    with open(f"{out}/shard_00000.ds.index", "rb") as f:
        raw = f.read()
    ends = struct.unpack(f"<{len(raw) // 8}Q", raw)
    assert len(ends) == docs.count()
    assert all(a <= b for a, b in zip(ends, ends[1:]))  # cumulative
    with open(f"{out}/shard_00000.ds", "rb") as f:
        n_tokens_bytes = len(f.read())
    assert ends[-1] * 2 == n_tokens_bytes  # uint16 tokens


def test_shuffle_is_deterministic_across_parallelism(spark, docs):
    a = [r.doc_id for r in tokenizer.shuffled(docs, partitions=2).select("doc_id").collect()]
    b = [r.doc_id for r in tokenizer.shuffled(docs, partitions=5).select("doc_id").collect()]
    assert a == b  # range partitioning + in-partition sort = one global order
    assert a != sorted(a)  # and it is actually shuffled


def test_context_shuffle(spark, tmp_path):
    """Windows are preserved as a multiset, resized to exactly window_size
    tokens, deterministically ordered by (seed, data), and reordered
    relative to the input stream; trailing partial windows drop (reference
    context_shuffler.py:72 nr_windows = total_len // window_size)."""
    from datatrove_spark.operators import tokenizer

    docs = [(i, f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(40))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
    src = str(tmp_path / "ds_in")
    tokenizer.write_tokenized(df, src)

    W = 7
    out1 = str(tmp_path / "ds_out1")
    tokenizer.context_shuffle(spark, src, out1, window_size=W)

    def windows_of(d):
        flat = [t for doc in tokenizer.read_tokenized(d) for t in doc]
        return flat

    # input windows: per input shard, chunk its flattened stream
    import os, struct
    in_wins = []
    for name in sorted(os.listdir(src)):
        if not name.endswith(".ds"):
            continue
        with open(os.path.join(src, name), "rb") as f:
            data = f.read()
        ids = struct.unpack(f"<{len(data) // 2}H", data)
        for k in range(len(ids) // W):
            in_wins.append(tuple(ids[k * W : (k + 1) * W]))

    out_docs = tokenizer.read_tokenized(out1)
    assert all(len(d) == W for d in out_docs)
    assert sorted(tuple(d) for d in out_docs) == sorted(in_wins)
    assert [tuple(d) for d in out_docs] != in_wins  # actually reordered

    # determinism: same seed -> identical output stream
    out2 = str(tmp_path / "ds_out2")
    tokenizer.context_shuffle(spark, src, out2, window_size=W)
    assert windows_of(out1) == windows_of(out2)
    # different seed -> different order
    out3 = str(tmp_path / "ds_out3")
    tokenizer.context_shuffle(spark, src, out3, window_size=W, seed="other")
    assert windows_of(out1) != windows_of(out3)
