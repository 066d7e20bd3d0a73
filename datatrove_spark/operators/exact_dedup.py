"""Exact deduplication — hash of canonicalized text, keep-first semantics.

The reference has no single exact-dedup operator (its cheapest analog is
url_dedup / the sentence-dedup machinery over sorted hash files,
src/datatrove/pipeline/dedup/url_dedup.py:56-62); this is the standard
hash-groupBy rendering every curation pipeline needs:

    key  = h60(simplify_text(text))      (dedup canonicalization,
                                          utils/text.py:39-71 analog)
    keep = this doc is the group's minimum doc_id   ("first occurrence
           wins" defined on DATA order, not arrival order — SURVEY §7.3.3)
    dup_of = min doc_id of the group (NULL for the kept doc)

Spark shape: one window over the hash key — a single hash-partitioned
shuffle of (key, id) pairs; column pruning means the full text never
shuffles. At 100 TB the shuffle carries ~16 bytes/doc. Skewed keys (e.g.
empty text) are bounded by AQE skew handling; the window function itself is
a per-key sort of doc_ids, tiny per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datatrove_spark.functions import text as T
from datatrove_spark.functions.hashing import hash60, sql_hash60

NAME = "exact_dedup"


def apply(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    key = hash60(T.simplify_text(F.col(text_col)))
    d = df.withColumn("dedup_key", key)
    w = Window.partitionBy("dedup_key")
    first_id = F.min(id_col).over(w)
    return (
        d.withColumn("dup_of", F.when(F.col(id_col) != first_id, first_id))
        .withColumn(f"{NAME}_keep", F.col("dup_of").isNull())
        .drop("dedup_key")
    )


def oracle_sql(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    simp = (
        f"trim(regexp_replace(regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g'), "
        "'[0-9]+', '0', 'g'))"
    )
    return f"""
WITH keyed AS (
  SELECT {id_col} AS id, {sql_hash60(simp)} AS k FROM {table}
), firsts AS (
  SELECT k, min(id) AS first_id FROM keyed GROUP BY 1
)
SELECT t.{id_col},
  CASE WHEN k2.id != f.first_id THEN f.first_id END AS dup_of,
  (k2.id = f.first_id) AS {NAME}_keep
FROM {table} t
JOIN keyed k2 ON t.{id_col} = k2.id
JOIN firsts f ON k2.k = f.k
""".strip()
