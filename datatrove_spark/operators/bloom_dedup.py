"""Bloom-filter dedup — the reference's SingleBloomFilter as an exact,
distributed shingle-membership computation.

Reference semantics (src/datatrove/pipeline/dedup/bloom_filter.py:166-188):
documents stream through in order; each doc's 13-gram shingles (simplified
text, hashed) are queried against a bloom bit-vector, the fraction of
shingle OCCURRENCES already present decides drop (> duplicate_threshold,
:186), and the doc's novel shingles are inserted afterwards (:184-185 —
update_bf runs AFTER the query loop, so within-doc repeats never count as
duplicates, and bits are inserted whether or not the doc is dropped).

That sequential state reduces to a pure data-order definition once the
bloom's false positives are removed: a shingle occurrence in doc d is a
duplicate iff some doc with a smaller doc_id contains the same shingle.
The Spark rendering is therefore EXACT (a bloom filter with m -> inf):

    occ       = (doc_id, shingle_hash, occurrences_in_doc)   [Arrow kernel]
    first_doc = min(doc_id) per shingle_hash                 [one shuffle]
    dup_frac  = sum(occ where first_doc < doc_id) / sum(occ) per doc
    keep      = dup_frac <= threshold  (docs with no shingles keep,
                matching step()'s early return, :173-174)

Scale shape: the only corpus-wide shuffle is keyed on the 8-byte shingle
hash (min-over-window, so the shingle kernel and the scan run exactly
once); text never shuffles. The per-doc reduce is a second small shuffle
on doc_id.
The reference's m-byte memory bound becomes Spark's shuffle spill — no
false-positive tradeoff is needed, which is WHY the sequential design
existed. "Processing order" is defined on doc_id (data order, not arrival
order), the engine-wide determinism rule (SURVEY §7.3.3).
"""

from __future__ import annotations

from pandas import Series
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

from datatrove_spark.functions.hashing import py_hash60, sql_hash60

NAME = "bloom_dedup"
DEFAULT_N = 13
DEFAULT_THRESHOLD = 0.8


def py_shingle_counts(text: str, n: int = DEFAULT_N) -> list[tuple[int, int]]:
    """Per-doc kernel: (h60(n-gram), occurrence count) over simplified text.

    Counts occurrences (not distinct grams) because the reference's ratio is
    over shingle occurrences (bloom_filter.py:178-186). Shares simplify/h60
    with the SQL oracle.
    """
    from datatrove_spark.reference_impl.filters import simplify_text

    ws = simplify_text(text or "").split()
    if len(ws) < n:
        return []
    counts: dict[str, int] = {}
    for i in range(len(ws) - n + 1):
        g = " ".join(ws[i : i + n])
        counts[g] = counts.get(g, 0) + 1
    return [(py_hash60(g), c) for g, c in counts.items()]


_SHINGLE_SCHEMA = ArrayType(
    StructType([StructField("h", LongType()), StructField("c", IntegerType())])
)


def shingle_counts(text_col, n: int = DEFAULT_N):
    """Arrow-batched kernel column: array<struct<h,c>> of shingle counts."""

    @F.pandas_udf(_SHINGLE_SCHEMA)
    def k(texts: Series) -> Series:
        from datatrove_spark.operators.bloom_dedup import py_shingle_counts

        return texts.map(lambda t: py_shingle_counts(t, n))

    return k(text_col)


def apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Adds bloom_dup_frac + bloom_keep (False when dup_frac > threshold)."""
    occ = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_counts(F.col(text_col), n)).alias("s"),
    ).select("id", F.col("s.h").alias("h"), F.col("s.c").alias("c"))

    # min-over-window instead of groupBy+self-join: the Arrow shingle kernel
    # and the corpus scan run ONCE, with a single shuffle keyed on the hash
    # (the groupBy+join form scans and re-kernels the corpus twice).
    first_id = F.min("id").over(Window.partitionBy("h"))
    per_doc = (
        occ.withColumn("first_id", first_id)
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("first_id") < F.col("id"), F.col("c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_c"),
            F.sum("c").cast("long").alias("tot_c"),
        )
        .select(
            "id",
            (F.col("dup_c").cast("double") / F.col("tot_c").cast("double")).alias(
                "bloom_dup_frac"
            ),
        )
    )
    out = df.join(per_doc, df[id_col] == per_doc["id"], "left").drop("id")
    frac = F.coalesce(F.col("bloom_dup_frac"), F.lit(0.0))
    return out.withColumn("bloom_dup_frac", frac).withColumn(
        f"{NAME}_keep", frac <= F.lit(threshold)
    )


_SIMPLIFY = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9]+', ' ', 'g'), '[0-9]+', '0', 'g'))"
)


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
    threshold: float = DEFAULT_THRESHOLD,
) -> str:
    simp = _SIMPLIFY.format(t=f"coalesce({text_col}, '')")
    ws = f"regexp_extract_all({simp}, '\\S+')"
    grams = (
        f"list_transform(range(1, greatest(len({ws}) - {n} + 1, 0) + 1), "
        f"i -> array_to_string(({ws})[i:i+{n}-1], ' '))"
    )
    return f"""
WITH occ AS (
  SELECT {id_col} AS id, {sql_hash60('g')} AS h, count(*)::BIGINT AS c
  FROM (SELECT {id_col}, unnest({grams}) AS g FROM {table})
  GROUP BY 1, 2
), firsts AS (
  SELECT h, min(id) AS first_id FROM occ GROUP BY 1
), per_doc AS (
  SELECT occ.id,
    (sum(CASE WHEN f.first_id < occ.id THEN occ.c ELSE 0 END)::DOUBLE
      / sum(occ.c)::DOUBLE) AS bloom_dup_frac
  FROM occ JOIN firsts f ON occ.h = f.h
  GROUP BY 1
)
SELECT t.{id_col},
  coalesce(p.bloom_dup_frac, 0.0) AS bloom_dup_frac,
  (coalesce(p.bloom_dup_frac, 0.0) <= {threshold}) AS {NAME}_keep
FROM {table} t LEFT JOIN per_doc p ON t.{id_col} = p.id
""".strip()
