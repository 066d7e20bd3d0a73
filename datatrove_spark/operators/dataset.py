"""Training read-back over tokenizer-sink shards (SURVEY.md §2.8).

Reference: DatatroveFileDataset / DatatroveFolderDataset
(src/datatrove/utils/dataset.py:17-139) — torch Datasets that serve
fixed-size ``seq_len + 1`` token windows straight out of ``.ds`` shards:
window count is ``file_tokens // (seq_len + 1)`` (:44), indexing wraps
modulo the epoch (:47-48), file handles open lazily per worker (:49-50),
the folder variant concatenates files via a cumsum index with a cached
current-file bisect (:125-137), optionally permuting file order with
``np.random.default_rng(seed)`` (:120-123) and truncating to ``max_tokens``
across files (:107-118).

Spark-side rendering:

- ``FileDataset`` / ``FolderDataset``: same windowing semantics, same
  ``{"input_ids": ...}`` item contract, but numpy ``int64`` arrays by
  default so the loader works without torch; when the torch wheel is
  present ``as_torch=True`` returns ``torch.long`` tensors exactly like
  the reference. Local filesystem paths (the sandbox has no fsspec
  remotes); the reference's fsspec URL layer is out of scope here.
- ``ds_windows``: the distributed path — shards land as ``binaryFile``
  rows and each decodes into its windows via one Arrow-batched
  ``np.frombuffer`` + reshape per file (vectorized, no per-window Python),
  yielding a DataFrame ``(shard, widx, input_ids)`` for corpus-scale
  inspection / repacking. Window identity (shard, widx) matches what
  ``FolderDataset`` would serve at the same seq_len, which the tests pin.
"""

from __future__ import annotations

import os
import re
from bisect import bisect
from collections.abc import Iterator

import numpy as np

try:  # gated: torch is not in the sandbox image
    import torch  # noqa: F401

    _HAS_TORCH = True
except Exception:  # pragma: no cover
    _HAS_TORCH = False

NAME = "dataset"


def _np_dtype(token_size: int):
    return np.uint16 if token_size == 2 else np.uint32


class FileDataset:
    """Windows of ``seq_len + 1`` tokens from one ``.ds`` shard.

    Matches DatatroveFileDataset (utils/dataset.py:17-63): length is
    ``min(max_tokens, file_tokens) // (seq_len + 1)``, ``__getitem__`` wraps
    modulo the dataset length, and the file handle opens lazily on first
    access (so the object pickles cleanly into loader workers).
    """

    def __init__(
        self,
        file_path: str,
        seq_len: int,
        token_size: int = 2,
        max_tokens: int | None = None,
        as_torch: bool = False,
    ):
        self.file_path = file_path
        self.seq_len = seq_len
        self.token_size = token_size
        if as_torch and not _HAS_TORCH:
            raise ImportError("as_torch=True requires the torch wheel")
        self.as_torch = as_torch
        num_tokens = os.path.getsize(file_path) // token_size
        self._len = (min(max_tokens, num_tokens) if max_tokens else num_tokens) // (seq_len + 1)
        self._f = None

    def __getitem__(self, item: int) -> dict:
        epoch_item = item % len(self)
        if not self._f:
            self._f = open(self.file_path, "rb")
        chunk_size = self.token_size * (self.seq_len + 1)
        self._f.seek(epoch_item * chunk_size)
        ids = np.frombuffer(self._f.read(chunk_size), _np_dtype(self.token_size)).astype(np.int64)
        if self.as_torch:
            return {"input_ids": torch.as_tensor(ids, dtype=torch.long)}
        return {"input_ids": ids}

    def __len__(self) -> int:
        return self._len


class FolderDataset:
    """Concatenation of every ``.ds`` shard under a folder.

    Matches DatatroveFolderDataset (utils/dataset.py:65-139): files are
    discovered in sorted path order (optionally filtered by a filename
    regex), ``max_tokens`` truncates across files *before* the optional
    seeded permutation of file order, and lookup bisects a cumsum of
    per-file window counts with a cached current-file hint.
    """

    def __init__(
        self,
        folder_path: str,
        seq_len: int,
        filename_pattern: str | re.Pattern | None = None,
        recursive: bool = True,
        token_size: int = 2,
        max_tokens: int | None = None,
        shuffle: bool = False,
        seed: int = 42,
        as_torch: bool = False,
    ):
        self.folder_path = folder_path
        if isinstance(filename_pattern, str):
            filename_pattern = re.compile(filename_pattern)
        matched: list[str] = []
        if recursive:
            # one GLOBAL sort over full paths, matching the reference's
            # fs.find lexicographic ordering — per-directory sorting would
            # diverge for names that sort across '/' (e.g. 'a.x/' vs 'a/'),
            # changing seeded-shuffle permutations and max_tokens truncation
            for root, _dirs, names in os.walk(folder_path):
                matched.extend(os.path.join(root, n) for n in names)
            matched.sort()
        else:
            matched = [
                os.path.join(folder_path, n)
                for n in sorted(os.listdir(folder_path))
                if os.path.isfile(os.path.join(folder_path, n))
            ]
        matched = [
            p
            for p in matched
            if p.endswith(".ds") and (not filename_pattern or filename_pattern.search(p))
        ]
        if not matched:
            raise FileNotFoundError(f'No .ds files matching "{filename_pattern}" found in {folder_path}')

        self.files: list[FileDataset] = []
        remaining = max_tokens
        for path in matched:
            fd = FileDataset(path, seq_len, token_size=token_size, max_tokens=remaining, as_torch=as_torch)
            self.files.append(fd)
            if remaining is not None:
                remaining -= len(fd) * (seq_len + 1)
                if remaining <= 0:
                    break

        if shuffle:
            rand = np.random.default_rng(seed)
            order = rand.permutation(range(len(self.files)))
            self.files = [self.files[i] for i in order]

        self.lens = np.cumsum([0] + [len(f) for f in self.files]).tolist()
        self.current_file = 0

    def __getitem__(self, item: int) -> dict:
        epoch_item = item % len(self)
        if not (self.lens[self.current_file] <= epoch_item < self.lens[self.current_file + 1]):
            self.current_file = bisect(self.lens, epoch_item) - 1
        return self.files[self.current_file][epoch_item - self.lens[self.current_file]]

    def __len__(self) -> int:
        return self.lens[-1] if self.lens else 0


def check_dataset(
    folder: str, token_size: int = 2, eos_token_id: int | None = None
) -> dict:
    """Validate tokenizer-sink output — the reference's
    ``tools/check_dataset.py`` (:56-98): every ``.ds`` has a matching
    ``.ds.index`` (and ``.ds.loss`` when any exists), per-document reads
    driven by doc_ends exhaust each shard exactly, the loss companion holds
    one byte per token, and (when ``eos_token_id`` is given) every document
    ends with the EOS id. Raises AssertionError on the first violation;
    returns {"files": n, "docs": n, "tokens": n} on success."""
    names = sorted(os.listdir(folder))
    ds = [n for n in names if n.endswith(".ds")]
    idx = [n for n in names if n.endswith(".ds.index")]
    loss = [n for n in names if n.endswith(".ds.loss")]
    assert [n + ".index" for n in ds] == idx, "Mismatch between .ds and .ds.index files"
    if loss:
        assert [n + ".loss" for n in ds] == loss, "Mismatch between .ds and .ds.loss files"
    n_docs = n_tokens = 0
    for name in ds:
        with open(os.path.join(folder, name + ".index"), "rb") as f:
            ends = np.frombuffer(f.read(), np.uint64).tolist()
        with open(os.path.join(folder, name), "rb") as f:
            prev = 0
            for doci, end in enumerate(ends):
                data = f.read((end - prev) * token_size)
                assert len(data) == (end - prev) * token_size, (
                    f"{name}: could not read doc {doci}"
                )
                if eos_token_id is not None and end > prev:
                    last = np.frombuffer(data[-token_size:], _np_dtype(token_size))[0]
                    assert last == eos_token_id, f"{name}: no EOS at doc end of doc {doci}"
                prev = end
            assert f.read(1) == b"", f"{name}: trailing bytes beyond last doc end"
        if loss:
            lsize = os.path.getsize(os.path.join(folder, name + ".loss"))
            assert lsize == (ends[-1] if ends else 0), f"{name}: loss bytes != tokens"
        n_docs += len(ends)
        n_tokens += int(ends[-1]) if ends else 0
    return {"files": len(ds), "docs": n_docs, "tokens": n_tokens}


def ds_windows(spark, in_dir: str, seq_len: int, token_size: int = 2):
    """Distributed windows read-back: DataFrame (shard, widx, input_ids).

    One ``np.frombuffer`` + reshape per shard file inside mapInPandas —
    the whole decode is a vectorized copy, with windows then exploded as
    Arrow list rows. Trailing partial windows are dropped, matching
    FileDataset's ``// (seq_len + 1)`` length. Shard files come from
    ``write_tokenized`` / ``context_shuffle``, whose per-partition writers
    bound shard size; binaryFile holds one shard per row, so keep shards at
    the writer's per-partition granularity (not pre-merged monoliths).
    """
    import pandas as pd

    win = seq_len + 1
    dtype = _np_dtype(token_size)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                ids = np.frombuffer(content, dtype)
                n = len(ids) // win
                if n == 0:
                    continue
                mat = ids[: n * win].astype(np.int64).reshape(n, win)
                yield pd.DataFrame(
                    {
                        "shard": [os.path.basename(path)] * n,
                        "widx": np.arange(n, dtype=np.int32),
                        "input_ids": list(mat),
                    }
                )

    files = spark.read.format("binaryFile").load(os.path.join(in_dir, "*.ds"))
    return files.select("path", "content").mapInPandas(
        decode, "shard string, widx int, input_ids array<bigint>"
    )
