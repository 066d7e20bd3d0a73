"""C4 quality filter — fully native Spark column expressions, including the
text REWRITE (kept-lines only), with a first-triggering-line doc-drop rule.

Semantics of reference C4QualityFilter (src/datatrove/pipeline/filters/
c4_filters.py:88-135), per line (in scan order):
  - drop line if any word > max_word_length chars               (:99)
  - strip wiki citations [1]/[edit]/[citation needed]           (:104)
  - drop line without terminal punct . ? ! " ' or ending "..."  (:106)
  - drop line with < min_words_per_line words                   (:110)
  - DOC drop 'lorem_ipsum' if line contains it                  (:115)
  - drop line containing 'javascript'                           (:118)
  - DOC drop 'curly_bracket' if line contains '{'               (:122)
  - drop line containing a policy substring                     (:125)
  - DOC drop 'too_few_sentences' if kept-line sentences < 5     (:131)
Kept lines are joined back with newlines (:134) — the doc text rewrite.

A document-level drop reason comes from the FIRST line (in document order)
that triggers one, matching the reference's sequential scan. Everything is
expressed with higher-order array functions over the split lines — one pass,
JVM codegen, no Python, no shuffle.

Sentence counting uses the engine's portable splitter (functions/text.py
sentences) instead of NLTK punkt — see config.py TOKENIZER NOTE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import CITATION_RE, C4QualityConfig, POLICY_SUBSTRINGS
from datatrove_spark.functions import text as T

NAME = "c4_quality"

_TERM_PUNCT_RE = "[.?!\"']$"


def _line_struct(ln: Column, cfg: C4QualityConfig) -> Column:
    s = T.trim_ws(ln)
    ws = F.regexp_extract_all(s, F.lit(r"\S+"), 0)
    too_long = (
        F.exists(ws, lambda w: F.length(w) > cfg.max_word_length)
        if cfg.max_word_length != -1
        else F.lit(False)
    )
    line2 = F.regexp_replace(s, CITATION_RE, "") if cfg.remove_citations else s
    term_ok = (
        line2.rlike(_TERM_PUNCT_RE) & ~line2.rlike(r"\.\.\.$")
        if cfg.filter_no_terminal_punct
        else F.lit(True)
    )
    survives_pre = ~too_long & term_ok & (F.size(ws) >= cfg.min_words_per_line)
    low = F.lower(line2)
    lorem = F.contains(low, F.lit("lorem ipsum")) if cfg.filter_lorem_ipsum else F.lit(False)
    js = F.contains(low, F.lit("javascript")) if cfg.filter_javascript else F.lit(False)
    curly = F.contains(line2, F.lit("{")) if cfg.filter_curly_bracket else F.lit(False)
    policy = (
        # fold the fixed substring list into an OR chain
        F.lit(False) if not cfg.filter_policy else _any_contains(low, POLICY_SUBSTRINGS)
    )
    doc_reason = F.when(survives_pre & lorem, "lorem_ipsum").when(
        survives_pre & ~js & curly, "curly_bracket"
    )
    kept = survives_pre & ~js & ~policy
    return F.struct(
        doc_reason.alias("doc_reason"),
        kept.alias("kept"),
        F.when(kept, F.size(T.sentences(line2))).otherwise(F.lit(0)).alias("sents"),
        line2.alias("line"),
    )


def _any_contains(low: Column, subs: tuple[str, ...]) -> Column:
    cond = F.lit(False)
    for s in subs:
        cond = cond | F.contains(low, F.lit(s))
    return cond


def columns(
    text_col: Column, cfg: C4QualityConfig = C4QualityConfig()
) -> tuple[Column, Column]:
    """Returns (reason, rewritten_text) columns."""
    structs = F.transform(T.lines(text_col), lambda ln: _line_struct(ln, cfg))
    first_doc_reason = F.get(
        F.filter(structs, lambda st: st["doc_reason"].isNotNull()), 0
    )["doc_reason"]
    num_sentences = F.aggregate(structs, F.lit(0), lambda acc, st: acc + st["sents"])
    reason = F.coalesce(
        first_doc_reason,
        F.when(num_sentences < cfg.min_num_sentences, "too_few_sentences"),
    )
    kept_text = T.trim_ws(
        F.array_join(
            F.transform(F.filter(structs, lambda st: st["kept"]), lambda st: st["line"]), "\n"
        )
    )
    # on drop, the text is left untouched (reference returns before mutating)
    new_text = F.when(reason.isNull(), kept_text).otherwise(text_col)
    return reason, new_text


def apply(
    df: DataFrame, text_col: str = "text", cfg: C4QualityConfig = C4QualityConfig()
) -> DataFrame:
    reason, new_text = columns(F.col(text_col), cfg)
    return (
        df.withColumn(f"{NAME}_reason", reason)
        .withColumn(f"{NAME}_keep", F.col(f"{NAME}_reason").isNull())
        .withColumn(f"{NAME}_text", new_text)
    )


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: C4QualityConfig = C4QualityConfig(),
) -> str:
    strip = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    policy_cond = " OR ".join(f"contains(low, '{p}')" for p in POLICY_SUBSTRINGS)
    citation = CITATION_RE.replace("'", "''")
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {text_col} AS t, string_split({text_col}, chr(10)) AS lns FROM {table}
), feat AS (
  SELECT id, t,
    list_transform(lns, raw -> {{
      'line': regexp_replace(trim(raw, {strip}), '{citation}', ''),
      'ws_n': len(regexp_extract_all(trim(raw, {strip}), '\\S+')),
      'too_long': len(list_filter(regexp_extract_all(trim(raw, {strip}), '\\S+'), w -> len(w) > {cfg.max_word_length})) > 0
    }}) AS ls
  FROM base
), flags AS (
  SELECT id, t,
    list_transform(ls, s -> {{
      'line': s['line'],
      'survives_pre': (NOT s['too_long'])
        AND regexp_matches(s['line'], '[.?!"'']$') AND NOT regexp_matches(s['line'], '\\.\\.\\.$')
        AND s['ws_n'] >= {cfg.min_words_per_line},
      'lorem': contains(lower(s['line']), 'lorem ipsum'),
      'js': contains(lower(s['line']), 'javascript'),
      'curly': contains(s['line'], '{{'),
      'policy': ({policy_cond.replace("low", "lower(s['line'])")})
    }}) AS fs
  FROM feat
), doc AS (
  SELECT id, t,
    list_transform(fs, f -> CASE
        WHEN f['survives_pre'] AND f['lorem'] THEN 'lorem_ipsum'
        WHEN f['survives_pre'] AND NOT f['js'] AND f['curly'] THEN 'curly_bracket'
      END) AS drs,
    list_filter(fs, f -> f['survives_pre'] AND NOT f['js'] AND NOT f['policy']) AS kept
  FROM flags
), res AS (
  SELECT id, t,
    coalesce(
      list_filter(drs, x -> x IS NOT NULL)[1],
      CASE WHEN coalesce(list_sum(list_transform(kept,
            f -> len(regexp_extract_all(f['line'], '[^.!?]+[.!?]+')))), 0) < {cfg.min_num_sentences}
        THEN 'too_few_sentences' END
    ) AS reason,
    trim(array_to_string(list_transform(kept, f -> f['line']), chr(10)), {strip}) AS kept_text
  FROM doc
)
SELECT id AS {id_col}, reason AS {NAME}_reason, (reason IS NULL) AS {NAME}_keep,
       CASE WHEN reason IS NULL THEN kept_text ELSE t END AS {NAME}_text
FROM res
""".strip()
