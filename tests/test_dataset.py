"""Training read-back (SURVEY §2.8): FileDataset / FolderDataset window
semantics vs the reference's DatatroveFileDataset/DatatroveFolderDataset
(utils/dataset.py:17-139), and the distributed ds_windows read-back."""

from __future__ import annotations

import numpy as np
import pytest

from datatrove_spark.operators import dataset, tokenizer


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    """3 .ds shards from 60 crafted docs, plus the flat per-shard streams."""
    docs = [(i, f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(25))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(3)
    out = str(tmp_path_factory.mktemp("ds_shards"))
    tokenizer.write_tokenized(df, out)
    import os, struct

    streams = {}
    for name in sorted(os.listdir(out)):
        if name.endswith(".ds"):
            with open(os.path.join(out, name), "rb") as f:
                data = f.read()
            streams[name] = list(struct.unpack(f"<{len(data) // 2}H", data))
    return out, streams


def expected_windows(stream, seq_len):
    w = seq_len + 1
    return [tuple(stream[k * w : (k + 1) * w]) for k in range(len(stream) // w)]


def test_file_dataset_windows(shards):
    out, streams = shards
    name = sorted(streams)[0]
    seq_len = 6
    ds = dataset.FileDataset(f"{out}/{name}", seq_len)
    exp = expected_windows(streams[name], seq_len)
    assert len(ds) == len(exp) == len(streams[name]) // (seq_len + 1)
    got = [tuple(ds[i]["input_ids"].tolist()) for i in range(len(ds))]
    assert got == exp
    assert ds[0]["input_ids"].dtype == np.int64
    # epoch wrap: index past the end loops (reference dataset.py:47-48)
    assert tuple(ds[len(ds)]["input_ids"].tolist()) == exp[0]
    assert tuple(ds[2 * len(ds) + 1]["input_ids"].tolist()) == exp[1]


def test_file_dataset_max_tokens(shards):
    out, streams = shards
    name = sorted(streams)[0]
    seq_len = 6
    cap = 3 * (seq_len + 1) + 2  # mid-window cap -> 3 full windows
    ds = dataset.FileDataset(f"{out}/{name}", seq_len, max_tokens=cap)
    assert len(ds) == 3
    assert tuple(ds[2]["input_ids"].tolist()) == expected_windows(streams[name], seq_len)[2]


def test_folder_dataset_concatenates_in_path_order(shards):
    out, streams = shards
    seq_len = 4
    ds = dataset.FolderDataset(out, seq_len)
    exp = [w for name in sorted(streams) for w in expected_windows(streams[name], seq_len)]
    assert len(ds) == len(exp)
    got = [tuple(ds[i]["input_ids"].tolist()) for i in range(len(ds))]
    assert got == exp
    # non-sequential access across file boundaries (bisect + cached hint)
    for i in [len(exp) - 1, 0, len(exp) // 2, 1]:
        assert tuple(ds[i]["input_ids"].tolist()) == exp[i]


def test_folder_dataset_shuffle_is_seeded_file_permutation(shards):
    out, streams = shards
    seq_len = 4
    seed = 7
    ds = dataset.FolderDataset(out, seq_len, shuffle=True, seed=seed)
    names = sorted(streams)
    order = np.random.default_rng(seed).permutation(range(len(names)))
    exp = [w for i in order for w in expected_windows(streams[names[i]], seq_len)]
    got = [tuple(ds[i]["input_ids"].tolist()) for i in range(len(ds))]
    assert got == exp
    # same seed reproduces, different seed permutes differently
    ds2 = dataset.FolderDataset(out, seq_len, shuffle=True, seed=seed)
    assert [tuple(ds2[i]["input_ids"].tolist()) for i in range(len(ds2))] == got


def test_folder_dataset_max_tokens_stops_across_files(shards):
    out, streams = shards
    seq_len = 4
    names = sorted(streams)
    first_windows = len(streams[names[0]]) // (seq_len + 1)
    # cap = first file's windows + 2 more windows worth of tokens
    cap = (first_windows + 2) * (seq_len + 1)
    ds = dataset.FolderDataset(out, seq_len, max_tokens=cap)
    assert len(ds) == first_windows + 2
    exp = [w for name in names for w in expected_windows(streams[name], seq_len)]
    assert tuple(ds[len(ds) - 1]["input_ids"].tolist()) == exp[len(ds) - 1]


def test_folder_dataset_filename_pattern(shards):
    out, streams = shards
    name = sorted(streams)[1]
    ds = dataset.FolderDataset(out, 4, filename_pattern=name.replace(".", r"\."))
    assert len(ds) == len(streams[name]) // 5
    with pytest.raises(FileNotFoundError):
        dataset.FolderDataset(out, 4, filename_pattern="no_such_shard")


def test_ds_windows_matches_folder_dataset(spark, shards):
    out, streams = shards
    seq_len = 4
    rows = dataset.ds_windows(spark, out, seq_len).collect()
    got = {(r.shard, r.widx): tuple(r.input_ids) for r in rows}
    exp = {
        (name, k): w
        for name in streams
        for k, w in enumerate(expected_windows(streams[name], seq_len))
    }
    assert got == exp


def test_torch_path_gated(shards):
    out, streams = shards
    if dataset._HAS_TORCH:
        ds = dataset.FileDataset(f"{out}/{sorted(streams)[0]}", 4, as_torch=True)
        import torch

        assert ds[0]["input_ids"].dtype == torch.long
    else:
        with pytest.raises(ImportError):
            dataset.FileDataset(f"{out}/{sorted(streams)[0]}", 4, as_torch=True)


def test_eos_loss_and_check_dataset(spark, tmp_path):
    docs = [(i, f"alpha beta gamma {i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(2)
    out = str(tmp_path / "ds_eos")
    EOS = 65535
    tokenizer.write_tokenized(df, out, eos_token_id=EOS, save_loss=True)
    report = dataset.check_dataset(out, eos_token_id=EOS)
    assert report["files"] == 2 and report["docs"] == 10
    # every doc ends with EOS and loss mask is byte-per-token
    back = tokenizer.read_tokenized(out)
    assert all(d[-1] == EOS for d in back)
    import os
    for name in os.listdir(out):
        if name.endswith(".ds"):
            assert os.path.getsize(f"{out}/{name}.loss") * 2 == os.path.getsize(f"{out}/{name}")

    # corruption is caught: truncate one shard
    shard = sorted(n for n in os.listdir(out) if n.endswith(".ds"))[0]
    with open(f"{out}/{shard}", "r+b") as f:
        f.truncate(os.path.getsize(f"{out}/{shard}") - 2)
    with pytest.raises(AssertionError):
        dataset.check_dataset(out, eos_token_id=EOS)
