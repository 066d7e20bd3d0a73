"""SimHash near-duplicate detection — 60-bit fingerprints + band LSH.

The reference has no simhash operator (its near-dup paths are minhash and
the bloom filter, SURVEY.md §2.6); this is the standard complement for a
web-scale curation engine, built on the same portable h60 hash family so
Spark and the DuckDB oracle agree bit-for-bit.

Engine contract (presence-weighted simhash — deterministic and
order-free):
  hs  = distinct h60(word) over words(simplify_text(text))
  bit b of fingerprint = 1  iff  |{h : bit b of h set}| * 2 > |hs|
  fingerprint = Σ bit_b << b          (60 bits, fits signed int64)
  bands: 4 x 15 bits; candidate pair = same value in any band
  verified pair: popcount(fp_a XOR fp_b) <= max_hamming (default 3)
  dedup: connected components over verified pairs, keep component min.

Shuffle shape matches minhash: explode 4 (band, value) rows per doc ->
one hash-partitioned groupBy; fingerprints are single longs so the
verification join is trivially narrow. All integer math, whole-stage
codegen, no Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import SimHashConfig
from datatrove_spark.functions import text as T
from datatrove_spark.functions.hashing import hash60, sql_hash60
from datatrove_spark.operators.minhash import connected_components

NAME = "simhash"


def py_fingerprint(text: str, cfg: SimHashConfig = SimHashConfig()) -> int | None:
    """numpy per-doc kernel — identical values to the expression path.
    NULL text -> None fingerprint (= the SQL oracle's NULL propagation)."""
    text = text or ""
    import numpy as np

    from datatrove_spark.functions.hashing import py_hash60
    from datatrove_spark.reference_impl.filters import simplify_text

    ws = list(dict.fromkeys(simplify_text(text).split()))
    if not ws:
        return None
    hs = np.fromiter((py_hash60(w) for w in ws), dtype=np.int64, count=len(ws))
    set_counts = ((hs[:, None] >> np.arange(cfg.bits)) & 1).sum(axis=0)
    bits = (set_counts * 2 > len(ws)).astype(np.int64)
    return int((bits << np.arange(cfg.bits)).sum())


def fingerprint(text_col: Column, cfg: SimHashConfig = SimHashConfig()) -> Column:
    ws = F.array_distinct(T.words(T.simplify_text(text_col)))
    hs = F.transform(ws, lambda w: hash60(w))
    n = F.size(hs)
    bits = [
        F.when(
            F.size(F.filter(hs, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)) * 2 > n,
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(cfg.bits)
    ]
    fp = bits[0]
    for b in bits[1:]:
        fp = fp + b
    return F.when(n > 0, fp)


def fingerprints_native(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        cfg: SimHashConfig = SimHashConfig()) -> DataFrame:
    """Declarative-expression variant (same values) — kept as executable
    documentation; the 60 per-bit higher-order filters are interpreted
    (CodegenFallback) and measured far slower than the numpy kernel."""
    return df.select(id_col, fingerprint(F.col(text_col), cfg).alias("fp")).filter(
        F.col("fp").isNotNull()
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 cfg: SimHashConfig = SimHashConfig()) -> DataFrame:
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def fp_udf(texts: pd.Series) -> pd.Series:
        from datatrove_spark.operators.simhash import py_fingerprint

        return texts.map(lambda t: py_fingerprint(t, cfg)).astype("Int64")

    return df.select(id_col, fp_udf(F.col(text_col)).alias("fp")).filter(
        F.col("fp").isNotNull()
    )


def pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
          cfg: SimHashConfig = SimHashConfig()) -> DataFrame:
    """Verified (a, b) pairs: band-collision candidates within max_hamming."""
    fps = fingerprints(df, id_col, text_col, cfg)
    band_bits = cfg.bits // cfg.bands
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.shiftright(F.col("fp"), i * band_bits).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for i in range(cfg.bands)
        ]
    )
    exploded = fps.select(id_col, "fp", F.explode(bands).alias("b")).select(
        id_col, "fp", F.col("b.band_id").alias("band_id"), F.col("b.val").alias("val")
    )
    left = exploded.select(
        F.col("band_id"), F.col("val"), F.col(id_col).alias("a"), F.col("fp").alias("fp_a")
    )
    right = exploded.select(
        F.col("band_id").alias("band_id2"), F.col("val").alias("val2"),
        F.col(id_col).alias("b"), F.col("fp").alias("fp_b"),
    )
    cand = left.join(
        right,
        (left.band_id == right.band_id2) & (left.val == right.val2) & (left.a < right.b),
    )
    verified = cand.filter(
        F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))) <= cfg.max_hamming
    )
    return verified.select("a", "b").distinct()


def apply(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
          cfg: SimHashConfig = SimHashConfig()) -> DataFrame:
    comp = connected_components(pairs(df, id_col, text_col, cfg))
    out = df.join(comp.withColumnRenamed("node", id_col), id_col, "left")
    return (
        out.withColumn("dup_of", F.when(F.col("rep") != F.col(id_col), F.col("rep")))
        .withColumn(f"{NAME}_keep", F.col("dup_of").isNull())
        .drop("rep")
    )


# --- DuckDB oracles ----------------------------------------------------------

_SIMPLIFY = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9]+', ' ', 'g'), '[0-9]+', '0', 'g'))"
)


def _sql_fp(text_col: str, cfg: SimHashConfig) -> str:
    simp = _SIMPLIFY.format(t=text_col)
    hs = f"list_transform(list_distinct(regexp_extract_all({simp}, '\\S+')), w -> {sql_hash60('w')})"
    bit_terms = " + ".join(
        f"(CASE WHEN len(list_filter(hs, h -> (h >> {b}) & 1 = 1)) * 2 > len(hs) THEN {1 << b} ELSE 0 END)"
        for b in range(cfg.bits)
    )
    return f"SELECT id, ({bit_terms})::BIGINT AS fp FROM (SELECT id, {hs} AS hs FROM base) WHERE len(hs) > 0"


def oracle_sql_fingerprints(table: str = "documents", id_col: str = "doc_id",
                            text_col: str = "text", cfg: SimHashConfig = SimHashConfig()) -> str:
    return f"""
WITH base AS (SELECT {id_col} AS id, {text_col} FROM {table}),
fp AS ({_sql_fp(text_col, cfg)})
SELECT id AS {id_col}, fp FROM fp
""".strip()


def oracle_sql_pairs(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text", cfg: SimHashConfig = SimHashConfig()) -> str:
    band_bits = cfg.bits // cfg.bands
    mask = (1 << band_bits) - 1
    fps = oracle_sql_fingerprints(table, id_col, text_col, cfg)
    bands = ", ".join(f"{{'band_id': {i}, 'val': (fp >> {i * band_bits}) & {mask}}}" for i in range(cfg.bands))
    return f"""
WITH fps AS ({fps}),
ex AS (
  SELECT {id_col} AS id, fp, unnest([{bands}], recursive := true) FROM fps
)
SELECT DISTINCT l.id AS a, r.id AS b
FROM ex l JOIN ex r ON l.band_id = r.band_id AND l.val = r.val AND l.id < r.id
WHERE bit_count(xor(l.fp, r.fp)) <= {cfg.max_hamming}
""".strip()


def oracle_sql_dedup(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text", cfg: SimHashConfig = SimHashConfig()) -> str:
    prs = oracle_sql_pairs(table, id_col, text_col, cfg)
    return f"""
WITH RECURSIVE prs AS ({prs}),
edges AS (SELECT a AS x, b AS y FROM prs UNION SELECT b, a FROM prs),
reach(x, y) AS (
  SELECT x, y FROM edges
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
),
rep AS (SELECT x AS node, least(min(y), x) AS rep FROM reach GROUP BY x)
SELECT t.{id_col},
  CASE WHEN rep.rep IS NOT NULL AND rep.rep != t.{id_col} THEN rep.rep END AS dup_of,
  (rep.rep IS NULL OR rep.rep = t.{id_col}) AS {NAME}_keep
FROM {table} t LEFT JOIN rep ON t.{id_col} = rep.node
""".strip()
