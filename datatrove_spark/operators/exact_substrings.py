"""Exact-substrings dedup — the reference's suffix-array stage chain as a
distributed L-gram cover computation.

Reference (src/datatrove/pipeline/dedup/exact_substrings.py:1-15): tokenize
docs to a sentinel-separated byte sequence (ESDatasetToSequence), merge to
one corpus-wide sequence (ESMergeSequences), run the EXTERNAL Rust
suffix-array tool from "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499) to find all byte ranges whose content occurs
more than once, then cut those ranges out of every document
(ESRangeRemover). Every occurrence of a duplicated span is removed,
including the first.

The suffix array is only a device for finding spans of length >= L that
occur >= 2 times. At token granularity that predicate has an exact
relational rendering:

    a token position is inside some duplicated span of length >= L
        <=>  it is covered by an L-gram occurring >= 2 times corpus-wide

(=> : a duplicated span of length M >= L contains a duplicated L-gram
covering each of its positions; <= : a duplicated L-gram IS a duplicated
span of length L.) So the whole pipeline becomes:

    occ   = (doc_id, pos, h60(L-gram))        [Arrow kernel + posexplode]
    dup   = gram hashes with global count >= 2     [one shuffle on hash]
    cover = union of [pos, pos+L-1] per doc over dup occurrences
    out   = text with covered tokens cut, rejoined with single spaces

Scale shape: the corpus-wide shuffle carries (8-byte hash, pos) per token
position — the same O(corpus tokens) the suffix-array build pays, but
hash-partitioned across executors instead of one machine holding the whole
sequence in RAM (the reference's merge stage is single-node by
construction, exact_substrings.py:86-130). Duplicated grams are found with
a count-over-window on the hash, so the gram kernel and the scan run
exactly once; text shuffles only in the final per-doc reduce keyed on
doc_id.

Documented deviations: (1) granularity is the engine's whitespace token
stream, not GPT-2 BPE bytes — L here is "tokens", the paper's unit is 50
BPE tokens; (2) output text rejoins kept tokens with single spaces (the
reference re-decodes token ids, which it itself documents as lossy for
some punctuation). Within-doc repeats (e.g. "a a a ... a") count toward
the >= 2 occurrences exactly as a self-similar suffix array does.
"""

from __future__ import annotations

import pandas as pd
from pandas import Series
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datatrove_spark.functions.hashing import py_hash60, sql_hash60

NAME = "exact_substrings"
DEFAULT_L = 50  # the paper's 50-token threshold


def py_gram_hashes(text: str, length: int = DEFAULT_L) -> list[int]:
    """Per-doc kernel: h60 of every L-token window (one per position)."""
    ws = (text or "").split()
    if len(ws) < length:
        return []
    return [py_hash60(" ".join(ws[i : i + length])) for i in range(len(ws) - length + 1)]


def gram_hashes(text_col, length: int = DEFAULT_L):
    @F.pandas_udf(ArrayType(LongType()))
    def k(texts: Series) -> Series:
        from datatrove_spark.operators.exact_substrings import py_gram_hashes

        return texts.map(lambda t: py_gram_hashes(t, length))

    return k(text_col)


def py_cut(
    text: str, intervals: list[tuple[int, int]] | None, length: int = DEFAULT_L
) -> tuple[int, int, str]:
    """Remove tokens covered by the sorted, disjoint [s, e] token-index
    intervals (the union of duplicated L-gram spans, merged Spark-side so
    the per-doc payload is O(#intervals), not O(#covered positions)).

    Returns (n_words, n_removed, rebuilt_text).
    """
    ws = (text or "").split()
    if not intervals:
        return len(ws), 0, " ".join(ws)
    out: list[str] = []
    removed = 0
    nxt = 0  # first index not yet emitted
    for s, e in intervals:
        out.extend(ws[nxt:s])
        removed += e - s + 1
        nxt = e + 1
    out.extend(ws[nxt:])
    return len(ws), removed, " ".join(out)


_CUT_SCHEMA = StructType(
    [
        StructField("n_words", LongType()),
        StructField("n_removed", LongType()),
        StructField("es_text", StringType()),
    ]
)


def _cut_udf(length: int):
    @F.pandas_udf(_CUT_SCHEMA)
    def k(texts: Series, ivs: Series) -> pd.DataFrame:
        from datatrove_spark.operators.exact_substrings import py_cut

        rows = [
            py_cut(t, None if p is None else [(int(iv["s"]), int(iv["e"])) for iv in p], length)
            for t, p in zip(texts, ivs)
        ]
        return pd.DataFrame(rows, columns=["n_words", "n_removed", "es_text"])

    return k


def apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = DEFAULT_L,
) -> DataFrame:
    """Adds n_words / n_removed / es_text (duplicated spans cut)."""
    g = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(gram_hashes(F.col(text_col), length)).alias("pos", "h"),
    )
    # count-over-window instead of groupBy+semi-join back onto g: the gram
    # kernel and the corpus scan run ONCE with a single shuffle on the hash.
    cnt = F.count("*").over(Window.partitionBy("h"))
    # union the covered [pos, pos+L-1] spans into disjoint intervals BEFORE
    # collecting per doc: a long fully-duplicated doc (the common case this
    # operator targets) collapses to ONE (s, e) struct instead of an
    # O(n_tokens) position array in a single row — the per-row payload is
    # O(#intervals). Spans [p1,·] and [p2,·] merge iff p2 <= p1 + L (overlap
    # or adjacency), so interval ids are a running count of gap starts.
    w_doc = Window.partitionBy("id").orderBy("pos")
    hits = (
        g.withColumn("cnt", cnt)
        .filter("cnt >= 2")
        .withColumn("__prev", F.lag("pos").over(w_doc))
        .withColumn(
            "__iv",
            F.sum(
                (F.col("__prev").isNull() | (F.col("pos") > F.col("__prev") + length)).cast("int")
            ).over(w_doc),
        )
        .groupBy("id", "__iv")
        .agg(F.min("pos").alias("s"), (F.max("pos") + F.lit(length - 1)).alias("e"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("dup_iv"))
    )
    out = df.join(hits, df[id_col] == hits["id"], "left").drop("id")
    cut = _cut_udf(length)(F.col(text_col), F.col("dup_iv"))
    return (
        out.withColumn("__cut", cut)
        .select("*", "__cut.n_words", "__cut.n_removed", "__cut.es_text")
        .drop("__cut", "dup_iv")
    )


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = DEFAULT_L,
) -> str:
    ws = f"regexp_extract_all(coalesce({text_col}, ''), '\\S+')"
    gram_expr = f"array_to_string(ws[i:i+{length}-1], ' ')"
    gram_structs = (
        f"list_transform(range(1, greatest(len(ws) - {length} + 1, 0) + 1), "
        f"i -> struct_pack(pos := i - 1, h := {sql_hash60(gram_expr)}))"
    )
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {ws} AS ws FROM {table}
), g AS (
  SELECT id, u.pos AS pos, u.h AS h
  FROM (SELECT id, unnest({gram_structs}) AS u FROM t)
), dup AS (
  SELECT h FROM g GROUP BY h HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT id, unnest(generate_series(pos, pos + {length} - 1)) AS cp
  FROM g WHERE h IN (SELECT h FROM dup)
), words AS (
  SELECT id, u.pos AS pos, u.w AS w
  FROM (SELECT id, unnest(list_transform(range(1, len(ws) + 1),
                    i -> struct_pack(pos := i - 1, w := ws[i]))) AS u FROM t)
), kept AS (
  SELECT w.id, string_agg(w.w, ' ' ORDER BY w.pos) AS es_text
  FROM words w LEFT JOIN cov ON w.id = cov.id AND w.pos = cov.cp
  WHERE cov.cp IS NULL GROUP BY w.id
), nrem AS (
  SELECT id, count(*)::BIGINT AS n_removed FROM cov GROUP BY 1
)
SELECT t.id AS {id_col},
  len(t.ws)::BIGINT AS n_words,
  coalesce(nrem.n_removed, 0) AS n_removed,
  coalesce(kept.es_text, '') AS es_text
FROM t LEFT JOIN kept ON t.id = kept.id LEFT JOIN nrem ON t.id = nrem.id
""".strip()
