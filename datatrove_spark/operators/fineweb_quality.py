"""FineWeb quality filter — fully native Spark column expressions.

Semantics of reference FineWebQualityFilter
(src/datatrove/pipeline/filters/fineweb_quality_filter.py:31-54), in order:
  1 line_punct_ratio   terminal-punct line ratio <= 0.12 -> drop   (:35-37)
  2 short_line_ratio   lines <= 30 chars ratio >= 0.67 -> drop     (:39-41)
  3 char_dup_ratio     duplicated-line chars / text chars >= 0.01  (:43-46)
  4 list_ratio         newlines / words > 0.3 -> drop              (:49-52)

The duplicated-line char count (occurrences after the first of each distinct
non-empty line) is computed with an O(lines^2) higher-order-function
expression — entirely JVM-side; per-document line counts are small, and no
shuffle is ever needed for this per-doc statistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import FineWebQualityConfig
from datatrove_spark.functions import text as T

NAME = "fineweb_quality"

_PUNCT_END_RE = "[.'\"!?]$"  # FINEWEB_STOP_CHARS as a regex class


def reason(text_col: Column, cfg: FineWebQualityConfig = FineWebQualityConfig()) -> Column:
    lns = T.lines(text_col)
    n_lines = F.size(lns)
    punct_ratio = F.size(F.filter(lns, lambda ln: ln.rlike(_PUNCT_END_RE))).cast("double") / n_lines
    short_ratio = (
        F.size(F.filter(lns, lambda ln: F.length(ln) <= cfg.short_line_length)).cast("double")
        / n_lines
    )
    nel = F.filter(lns, lambda ln: T.trim_ws(ln) != "")  # strip ALL whitespace (Python str.strip parity)
    # chars in line occurrences after the first of each distinct line:
    # for index i (0-based), count len if the line appears among the first i
    dup_chars = F.aggregate(
        F.transform(
            nel,
            lambda ln, i: F.when(F.array_position(F.slice(nel, 1, i), ln) > 0, F.length(ln)).otherwise(
                F.lit(0)
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    text_wo_nl_len = F.length(F.replace(text_col, F.lit("\n"), F.lit("")))
    nl_count = T.char_count(text_col, "\n")
    n_words = F.size(T.words(text_col))

    drop_punct = punct_ratio <= cfg.line_punct_thr
    if cfg.line_punct_exclude_zero:
        drop_punct = drop_punct & (punct_ratio != 0.0)
    return (
        F.when(drop_punct, "line_punct_ratio")
        .when(short_ratio >= cfg.short_line_thr, "short_line_ratio")
        .when(
            dup_chars.cast("double") / text_wo_nl_len >= cfg.char_duplicates_ratio,
            "char_dup_ratio",
        )
        .when(nl_count.cast("double") / n_words > cfg.new_line_ratio, "list_ratio")
        .otherwise(F.lit(None).cast("string"))
    )


def apply(
    df: DataFrame, text_col: str = "text", cfg: FineWebQualityConfig = FineWebQualityConfig()
) -> DataFrame:
    r = reason(F.col(text_col), cfg)
    return df.withColumn(f"{NAME}_reason", r).withColumn(f"{NAME}_keep", F.col(f"{NAME}_reason").isNull())


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: FineWebQualityConfig = FineWebQualityConfig(),
) -> str:
    zero_guard = "AND punct_ratio != 0" if cfg.line_punct_exclude_zero else ""
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {text_col} AS t,
         string_split({text_col}, chr(10)) AS lns,
         list_filter(string_split({text_col}, chr(10)), l -> trim(l, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) != '') AS nel
  FROM {table}
), feat AS (
  SELECT id, t,
    len(lns) AS n_lines,
    len(list_filter(lns, l -> regexp_matches(l, '[.''"!?]$')))::DOUBLE / nullif(len(lns), 0) AS punct_ratio,
    len(list_filter(lns, l -> len(l) <= {cfg.short_line_length}))::DOUBLE / nullif(len(lns), 0) AS short_ratio,
    coalesce(list_sum(list_transform(range(1, len(nel)+1),
        i -> CASE WHEN len(list_filter(nel[1:i-1], e -> e = nel[i])) > 0 THEN len(nel[i]) ELSE 0 END)), 0) AS dup_chars,
    len(replace(t, chr(10), '')) AS t_wo_nl,
    (len(t) - len(replace(t, chr(10), ''))) AS nl_count,
    len(regexp_extract_all(t, '\\S+')) AS n_words
  FROM base
)
SELECT id AS {id_col},
  CASE
    WHEN punct_ratio <= {cfg.line_punct_thr} {zero_guard} THEN 'line_punct_ratio'
    WHEN short_ratio >= {cfg.short_line_thr} THEN 'short_line_ratio'
    WHEN dup_chars::DOUBLE / nullif(t_wo_nl, 0) >= {cfg.char_duplicates_ratio} THEN 'char_dup_ratio'
    WHEN nl_count::DOUBLE / nullif(n_words, 0) > {cfg.new_line_ratio} THEN 'list_ratio'
    ELSE NULL
  END AS {NAME}_reason
FROM feat
""".strip()
