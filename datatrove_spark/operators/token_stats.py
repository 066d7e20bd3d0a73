"""Token counting + corpus statistics.

Reference ops re-expressed relationally:
- TokensCounter (src/datatrove/pipeline/tokens/counter.py:31-56) — per-doc
  token_count. The reference batch-encodes with an HF tokenizer; the engine's
  built-in counter is the portable BPE-ish regex (config.TOKEN_RE: letter
  runs / digit runs / symbol runs), fully JVM-native.
- LengthCounter (counter.py:58-83) — token_count histogram = groupBy.count.
- DocLenStats (pipeline/stats/doc_len.py) + URLStats (pipeline/stats/
  urls.py:39-87) — per-group doc/char/token totals. groupBy gives Spark's
  partial+final aggregation automatically (the reference hand-rolls
  map-side counters merged in a single reduce task).

Determinism: averages are computed as exact integer sums divided once at the
end — no float accumulation across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import TOKEN_RE
from datatrove_spark.functions import text as T

NAME = "token_stats"


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    # BIGINT, matching the DuckDB oracle's len() (pandas int64 vs int32 drift
    # otherwise shows up in the driver's dtype-sensitive frame compare)
    return df.withColumn("token_count", T.token_count(F.col(text_col)).cast("long"))


def group_stats(df: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Per-group corpus stats: docs, token/char totals, exact means."""
    d = with_token_count(df, text_col).withColumn("n_chars_", F.length(text_col))
    return (
        d.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("token_count").alias("total_tokens"),
            F.sum("n_chars_").alias("total_chars"),
            F.min("token_count").alias("min_tokens"),
            F.max("token_count").alias("max_tokens"),
        )
        .withColumn(
            "avg_tokens", F.round(F.col("total_tokens").cast("double") / F.col("n_docs"), 4)
        )
    )


def length_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LengthCounter: one row per observed token_count."""
    return with_token_count(df, text_col).groupBy("token_count").agg(F.count("*").alias("n_docs"))


def oracle_sql_doc_tokens(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
SELECT {id_col}, len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS token_count
FROM {table}
""".strip()


def oracle_sql_group_stats(table: str = "documents", group_col: str = "lang", text_col: str = "text") -> str:
    return f"""
WITH d AS (
  SELECT {group_col}, len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS tc,
         len({text_col}) AS nc
  FROM {table}
)
SELECT {group_col}, count(*) AS n_docs, sum(tc)::BIGINT AS total_tokens, sum(nc)::BIGINT AS total_chars,
       min(tc) AS min_tokens, max(tc) AS max_tokens,
       round(sum(tc)::DOUBLE / count(*), 4) AS avg_tokens
FROM d GROUP BY 1
""".strip()


def oracle_sql_length_histogram(table: str = "documents", text_col: str = "text") -> str:
    return f"""
SELECT len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS token_count, count(*) AS n_docs
FROM {table} GROUP BY 1
""".strip()
