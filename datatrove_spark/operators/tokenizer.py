"""Document tokenization + binary token sink (SURVEY.md §2.8).

Reference: DocumentTokenizer writes little-endian uint16/uint32 token
streams per shard with a `.index` companion of uint64 document-end offsets
(src/datatrove/pipeline/tokens/tokenizer.py:22-243: token_format "H"/"I"
:54-55, doc_ends index struct.pack("<%sQ") :79-81), with optional in-file
document shuffling; DocumentTokenizerMerger re-orders docs randomly across
files (tokens/merger.py:14,82+).

Spark shape:
- ``token_ids``         one narrow projection: text -> array<int> ids. Real
                        subword tokenization needs the HF `tokenizers` wheel
                        (gated import, per-executor singleton); the built-in
                        deterministic stand-in maps TOKEN_RE tokens through
                        the portable h60 hash onto the vocab — same plumbing
                        (ids, shard format, index math), SQL-oracle-able.
- ``write_tokenized``   mapPartitions sink: each partition streams its docs
                        into `shard_{pid}.ds` (+ `.ds.index`) in the
                        reference's byte format; constant memory, one shard
                        per partition = per-executor sequential IO.
- ``shuffled``          deterministic document shuffle: repartition +
                        sortWithinPartitions on h60(salt|id) — the
                        distributed rendering of the merger's random doc
                        ordering, reproducible at any parallelism.
- ``read_tokenized``    driver-side reader for verification/round-trips.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.functions.hashing import hash60, py_hash60, sql_hash60

NAME = "tokenizer"

VOCAB_SIZE = 65536  # uint16 token ids, reference token_size=2 default
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_ids(text_col: Column, vocab_size: int = VOCAB_SIZE) -> Column:
    """array<int> ids — native expression (regex split + hash, codegen)."""
    toks = F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0)
    return F.transform(toks, lambda t: F.pmod(hash60(t), F.lit(vocab_size)).cast("int"))


def py_token_ids(text: str, vocab_size: int = VOCAB_SIZE) -> list[int]:
    import re

    return [py_hash60(t) % vocab_size for t in re.findall(TOKEN_RE, text or "")]


def sql_token_ids(text_expr: str, vocab_size: int = VOCAB_SIZE) -> str:
    return (
        f"list_transform(regexp_extract_all({text_expr}, '{TOKEN_RE}'), "
        f"t -> ({sql_hash60('t')} % {vocab_size})::INT)"
    )


def with_token_ids(df: DataFrame, text_col: str = "text", vocab_size: int = VOCAB_SIZE) -> DataFrame:
    return df.withColumn("token_ids", token_ids(F.col(text_col), vocab_size)).withColumn(
        "n_tokens", F.size("token_ids")
    )


def shuffled(df: DataFrame, id_col: str = "doc_id", seed: str = "shuffle", partitions: int | None = None) -> DataFrame:
    """Deterministic global document shuffle (merger.py's random ordering,
    but data-keyed): order and placement depend only on (seed, id)."""
    key = F.pmod(hash60(F.concat(F.lit(seed), F.col(id_col).cast("string"))), F.lit(1 << 60))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__shufkey", key)
        .repartitionByRange(n, "__shufkey")
        .sortWithinPartitions("__shufkey")
        .drop("__shufkey")
    )


def write_tokenized(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = VOCAB_SIZE,
    token_size: int = 2,
    eos_token_id: int | None = None,
    save_loss: bool = False,
) -> None:
    """Write `shard_{pid:05d}.ds` (+ `.ds.index`) per partition in the
    reference byte format. Token ids are recomputed inside the partition
    writer (narrow, no extra pass); docs with zero tokens still get an index
    entry (matching TokenizedFile, which records every written doc).

    ``eos_token_id`` appends that id after each document's tokens — the
    reference's default behavior (tokenizer.py:284 eos_token, appended per
    doc), with doc_ends counting the eos like any written token.
    ``save_loss`` writes the `.ds.loss` companion of one mask byte per
    written token (tokenizer.py:42,115-125,137 struct "<%s?"); this engine
    has no no-loss metadata spans, so the mask is all ones."""
    fmt = "I" if token_size == 4 else "H"
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(pid: int, rows):
        path = os.path.join(out_dir, f"shard_{pid:05d}.ds")
        doc_ends: list[int] = []
        written = 0
        loss_f = open(path + ".loss", "wb") if save_loss else None
        with open(path, "wb") as f:
            for row in rows:
                ids = py_token_ids(row[text_col] or "", vocab_size)
                if eos_token_id is not None:
                    ids.append(eos_token_id)
                if ids:
                    f.write(struct.pack(f"<{len(ids)}{fmt}", *ids))
                    if loss_f:
                        loss_f.write(b"\x01" * len(ids))
                written += len(ids)
                doc_ends.append(written)
        if loss_f:
            loss_f.close()
        with open(path + ".index", "wb") as f:
            f.write(struct.pack(f"<{len(doc_ends)}Q", *doc_ends))
        return []

    df.select(id_col, text_col).rdd.mapPartitionsWithIndex(write_partition).count()


def context_shuffle(
    spark,
    in_dir: str,
    out_dir: str,
    window_size: int = 2048 + 1,
    seed: str = "ctx",
    token_size: int = 2,
) -> None:
    """Distributed context-window shuffle over .ds shards — the
    DocumentTokenizerContextShuffler analog (reference: tokens/
    context_shuffler.py:13,55-86: per-file mmap + numpy RNG permutation of
    window_size-token windows, trailing partial window dropped).

    Spark rendering: shards land as binaryFile rows, each explodes into
    window_size*token_size-byte slices JVM-side (substring on BINARY — no
    Python in the split), and placement is the engine's data-keyed
    deterministic shuffle (h60(seed|shard|window) range partitioning,
    matching ``shuffled``'s documented RNG deviation): global across
    shards rather than within one file, order a pure function of
    (seed, data). Output shards are .ds files whose index records one doc
    end per window."""
    from pyspark.sql import functions as F

    from datatrove_spark.functions.hashing import hash60

    wbytes = window_size * token_size
    files = spark.read.format("binaryFile").load(os.path.join(in_dir, "*.ds"))
    n_win = F.floor(F.length("content") / wbytes).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.substring(F.col("content"), (i * wbytes + 1).cast("int"), wbytes),
    )
    exploded = files.select(
        F.col("path"), F.posexplode(windows).alias("widx", "win")
    ).filter(n_win > 0)
    key = F.pmod(
        hash60(F.concat(F.lit(seed), F.col("path"), F.col("widx").cast("string"))),
        F.lit(1 << 60),
    )
    placed = (
        exploded.withColumn("__k", key)
        .repartitionByRange(spark.sparkContext.defaultParallelism, "__k")
        .sortWithinPartitions("__k")
        .select("win")
    )
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(pid: int, rows):
        path = os.path.join(out_dir, f"shard_{pid:05d}.ds")
        ends: list[int] = []
        written = 0
        with open(path, "wb") as f:
            for row in rows:
                f.write(row["win"])
                written += window_size
                ends.append(written)
        with open(path + ".index", "wb") as f:
            f.write(struct.pack(f"<{len(ends)}Q", *ends))
        return []

    placed.rdd.mapPartitionsWithIndex(write_partition).count()


def read_tokenized(out_dir: str, token_size: int = 2) -> list[list[int]]:
    """Driver-side verification reader: list of per-doc id lists across all
    shards (shard order = filename order)."""
    fmt = "I" if token_size == 4 else "H"
    docs: list[list[int]] = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".ds"):
            continue
        with open(os.path.join(out_dir, name), "rb") as f:
            data = f.read()
        with open(os.path.join(out_dir, name + ".index"), "rb") as f:
            raw = f.read()
        ends = struct.unpack(f"<{len(raw) // 8}Q", raw)
        ids = struct.unpack(f"<{len(data) // token_size}{fmt}", data)
        prev = 0
        for e in ends:
            docs.append(list(ids[prev:e]))
            prev = e
    return docs
