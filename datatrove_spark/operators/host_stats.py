"""Per-host statistics with explicit skew salting — the URLStats analog.

Reference: URLStats (src/datatrove/pipeline/stats/urls.py:39-87) counts
docs/tokens per fqdn with per-rank partial maps reduced by a single task.
On web data the host key is power-law skewed (a few giant hosts); the north
rule calls for salted keys + two-phase aggregation.

Shape:
    phase 1  groupBy(host, salt = pmod(h60(url), S)) — the hot host's rows
             spread over S reducers; partial sums are tiny
    phase 2  groupBy(host) over the S partials — at most S rows per host

For plain count/sum Spark's map-side partial aggregation already bounds
skew, so salting matters for the *exact-distinct* and collect-style
aggregates where partials are per-key sets; n_urls (count distinct) here is
the realistic case. The result is identical to the unsalted plan (tests
assert it) — salting is purely a physical-distribution choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.functions import text as T
from datatrove_spark.functions.hashing import hash60
from datatrove_spark.operators.url_dedup import normalize_url

NAME = "host_stats"


def host_of(url: Column) -> Column:
    return F.split(normalize_url(url), "/", 2).getItem(0)


def apply(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    salt_buckets: int = 16,
) -> DataFrame:
    """(host, n_docs, n_urls, total_tokens, avg_tokens) via salted two-phase
    aggregation."""
    d = df.select(
        host_of(F.col(url_col)).alias("host"),
        F.col(url_col).alias("__url"),
        T.token_count(F.col(text_col)).alias("__tokens"),
    ).withColumn("__salt", F.pmod(hash60(F.col("__url")), F.lit(salt_buckets)))
    partial = d.groupBy("host", "__salt").agg(
        F.count("*").alias("pn"),
        F.count_distinct("__url").alias("pu"),
        F.sum("__tokens").alias("pt"),
    )
    out = partial.groupBy("host").agg(
        F.sum("pn").alias("n_docs"),
        F.sum("pu").alias("n_urls"),  # exact: urls are salted disjointly by hash(url)
        F.sum("pt").alias("total_tokens"),
    )
    return out.withColumn(
        "avg_tokens", F.round(F.col("total_tokens").cast("double") / F.col("n_docs"), 4)
    )


def topk(df: DataFrame, k: int = 10, **kwargs) -> DataFrame:
    return apply(df, **kwargs).orderBy(F.desc("n_docs"), F.asc("host")).limit(k)


def oracle_sql(table: str, url_expr: str, text_col: str = "text") -> str:
    norm = (
        f"regexp_replace(regexp_replace(regexp_replace(lower({url_expr}), '^https?://', ''), "
        "'^www\\.', ''), '/$', '')"
    )
    host = f"string_split({norm}, '/')[1]"
    from datatrove_spark.config import TOKEN_RE

    return f"""
SELECT {host} AS host,
  count(*) AS n_docs,
  count(DISTINCT {url_expr}) AS n_urls,
  sum(len(regexp_extract_all({text_col}, '{TOKEN_RE}')))::BIGINT AS total_tokens,
  round(sum(len(regexp_extract_all({text_col}, '{TOKEN_RE}')))::DOUBLE / count(*), 4) AS avg_tokens
FROM {table}
GROUP BY 1
""".strip()
