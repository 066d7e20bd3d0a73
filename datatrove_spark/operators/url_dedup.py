"""URL deduplication — keep the single best document per normalized URL.

Reference: the 3-stage UrlDedup pipeline (src/datatrove/pipeline/dedup/
url_dedup.py — signature :69-153, find :183-286, filter :288-361) keeps, per
hash(normalized url), the doc with max `document_priority`, tie-broken by
lowest doc id (sort key :56-62, with the negate-priority trick :107-112).

Spark collapses all three file-shuffling stages into ONE window:

    row_number() OVER (PARTITION BY h60(norm_url)
                       ORDER BY priority DESC, doc_id ASC) = 1

i.e. a single hash shuffle of (url_hash, priority, id) — no sorted signature
files, no k-way heap merges, no sequential finder task. Equivalently
``max_by(id, (priority, -id))`` per group. Hot URLs are a bounded-skew key
(duplicates of one URL), handled by AQE.

Normalization: lowercase, strip scheme + 'www.' + trailing slash (the
reference normalizes via its url utils; same spirit, portable rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datatrove_spark.functions.hashing import hash60, sql_hash60

NAME = "url_dedup"


def normalize_url(url: Column) -> Column:
    u = F.lower(url)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    return F.regexp_replace(u, r"/$", "")


def apply(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    priority_col: str | None = None,
) -> DataFrame:
    """Adds `url_dedup_keep`: True for the winning doc of each URL group."""
    key = hash60(normalize_url(F.col(url_col)))
    prio = F.col(priority_col) if priority_col else F.lit(1)
    w = Window.partitionBy(key).orderBy(prio.desc(), F.col(id_col).asc())
    return df.withColumn(f"{NAME}_keep", F.row_number().over(w) == 1)


SQL_NORM = (
    "regexp_replace(regexp_replace(regexp_replace(lower({u}), '^https?://', ''), "
    "'^www\\.', ''), '/$', '')"
)


def oracle_sql(
    table: str,
    url_expr: str,
    id_col: str = "doc_id",
    priority_expr: str = "1",
) -> str:
    norm = SQL_NORM.format(u=url_expr)
    return f"""
SELECT {id_col},
  (row_number() OVER (PARTITION BY {sql_hash60(norm)}
                      ORDER BY {priority_expr} DESC, {id_col} ASC) = 1) AS {NAME}_keep
FROM {table}
""".strip()
