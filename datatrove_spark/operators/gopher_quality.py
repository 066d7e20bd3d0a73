"""Gopher quality heuristics as native Spark column expressions.

Semantics of reference GopherQualityFilter
(src/datatrove/pipeline/filters/gopher_quality_filter.py:62-125), re-expressed
declaratively: ten thresholded checks evaluated in reference order; the first
failing check's reason string is recorded. Entirely JVM-side (whole-stage
codegen) — zero Python in the hot path.

Rule order and reason strings (gopher_quality_filter.py):
  1 gopher_short_doc            non-symbol words < min_doc_words          (:80)
  2 gopher_long_doc             non-symbol words > max_doc_words          (:82)
  3 gopher_below_avg_threshold  mean non-symbol word length < 3           (:87)
  4 gopher_above_avg_threshold  mean non-symbol word length > 10          (:89)
  5 gopher_too_many_hashes      '#' count / words > 0.1                   (:93)
  6 gopher_too_many_ellipsis    ('...' + '…') count / words > 0.1         (:95)
  7 gopher_too_many_bullets     lines starting with bullet > 90%          (:101)
  8 gopher_too_many_end_ellipsis lines ending with ellipsis > 30%         (:107)
  9 gopher_below_alpha_threshold words with a letter < 80%                (:115)
 10 gopher_enough_stop_words    stop-word occurrences < 2                 (:122)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import ALPHA_RE, GopherQualityConfig
from datatrove_spark.functions import text as T

NAME = "gopher_quality"


def reason(text_col: Column, cfg: GopherQualityConfig = GopherQualityConfig()) -> Column:
    ws = T.words(text_col)
    nsw = T.non_symbol_words(ws)
    n_words = F.size(ws)
    n_nsw = F.size(nsw)
    nsw_len_sum = F.aggregate(nsw, F.lit(0), lambda acc, w: acc + F.length(w))
    avg_len = nsw_len_sum.cast("double") / n_nsw  # null when n_nsw = 0 (guarded by rule 1)

    lns = T.lines(text_col)
    n_lines = F.size(lns)
    bullet_lines = F.size(F.filter(lns, lambda ln: F.regexp_replace(ln, r"^\s+", "").rlike(r"^(•|-)")))
    ellipsis_lines = F.size(
        F.filter(lns, lambda ln: F.regexp_replace(ln, r"\s+$", "").rlike(r"(\.\.\.|…)$"))
    )
    hash_ratio = T.char_count(text_col, "#").cast("double") / n_words
    ellipsis_ratio = (T.substr_count(text_col, "...") + T.char_count(text_col, "…")).cast(
        "double"
    ) / n_words
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike(ALPHA_RE)))
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(*cfg.stop_words)))

    return (
        F.when(n_nsw < cfg.min_doc_words, "gopher_short_doc")
        .when(n_nsw > cfg.max_doc_words, "gopher_long_doc")
        .when(avg_len < cfg.min_avg_word_length, "gopher_below_avg_threshold")
        .when(avg_len > cfg.max_avg_word_length, "gopher_above_avg_threshold")
        .when(hash_ratio > cfg.max_symbol_word_ratio, "gopher_too_many_hashes")
        .when(ellipsis_ratio > cfg.max_symbol_word_ratio, "gopher_too_many_ellipsis")
        .when(
            bullet_lines.cast("double") / n_lines > cfg.max_bullet_lines_ratio,
            "gopher_too_many_bullets",
        )
        .when(
            ellipsis_lines.cast("double") / n_lines > cfg.max_ellipsis_lines_ratio,
            "gopher_too_many_end_ellipsis",
        )
        .when(
            n_alpha.cast("double") / n_words < cfg.max_non_alpha_words_ratio,
            "gopher_below_alpha_threshold",
        )
        .when(stop_hits < cfg.min_stop_words, "gopher_enough_stop_words")
        .otherwise(F.lit(None).cast("string"))
    )


def apply(df: DataFrame, text_col: str = "text", cfg: GopherQualityConfig = GopherQualityConfig()) -> DataFrame:
    r = reason(F.col(text_col), cfg)
    return df.withColumn(f"{NAME}_reason", r).withColumn(f"{NAME}_keep", r.isNull())


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: GopherQualityConfig = GopherQualityConfig(),
) -> str:
    """DuckDB SQL computing identical (id, keep, reason) rows."""
    stop_list = ", ".join(f"'{w}'" for w in cfg.stop_words)
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {text_col} AS t,
         regexp_extract_all({text_col}, '\\S+') AS ws,
         string_split({text_col}, chr(10)) AS lns
  FROM {table}
), feat AS (
  SELECT id,
    len(ws) AS n_words,
    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z0-9]'))) AS n_nsw,
    list_sum(list_transform(list_filter(ws, w -> regexp_matches(w, '[A-Za-z0-9]')), w -> len(w))) AS nsw_len_sum,
    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha,
    len(list_filter(ws, w -> w IN ({stop_list}))) AS stop_hits,
    (len(t) - len(replace(t, '#', ''))) AS n_hash,
    (len(t) - len(replace(t, '...', ''))) / 3 AS n_dots,
    (len(t) - len(replace(t, '…', ''))) AS n_hellip,
    len(lns) AS n_lines,
    len(list_filter(lns, l -> regexp_matches(regexp_replace(l, '^\\s+', ''), '^(•|-)'))) AS bullet_lines,
    len(list_filter(lns, l -> regexp_matches(regexp_replace(l, '\\s+$', ''), '(\\.\\.\\.|…)$'))) AS ellipsis_lines
  FROM base
), r AS (
  SELECT id,
    CASE
      WHEN n_nsw < {cfg.min_doc_words} THEN 'gopher_short_doc'
      WHEN n_nsw > {cfg.max_doc_words} THEN 'gopher_long_doc'
      WHEN nsw_len_sum::DOUBLE / nullif(n_nsw, 0) < {cfg.min_avg_word_length} THEN 'gopher_below_avg_threshold'
      WHEN nsw_len_sum::DOUBLE / nullif(n_nsw, 0) > {cfg.max_avg_word_length} THEN 'gopher_above_avg_threshold'
      WHEN n_hash::DOUBLE / nullif(n_words, 0) > {cfg.max_symbol_word_ratio} THEN 'gopher_too_many_hashes'
      WHEN (n_dots + n_hellip)::DOUBLE / nullif(n_words, 0) > {cfg.max_symbol_word_ratio} THEN 'gopher_too_many_ellipsis'
      WHEN bullet_lines::DOUBLE / nullif(n_lines, 0) > {cfg.max_bullet_lines_ratio} THEN 'gopher_too_many_bullets'
      WHEN ellipsis_lines::DOUBLE / nullif(n_lines, 0) > {cfg.max_ellipsis_lines_ratio} THEN 'gopher_too_many_end_ellipsis'
      WHEN n_alpha::DOUBLE / nullif(n_words, 0) < {cfg.max_non_alpha_words_ratio} THEN 'gopher_below_alpha_threshold'
      WHEN stop_hits < {cfg.min_stop_words} THEN 'gopher_enough_stop_words'
      ELSE NULL
    END AS reason
  FROM feat
)
SELECT id AS {id_col}, reason AS {NAME}_reason, (reason IS NULL) AS {NAME}_keep FROM r
""".strip()
