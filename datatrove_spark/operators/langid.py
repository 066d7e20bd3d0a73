"""Language identification — stopword-profile n-gram heuristic, JVM-native.

The reference's LanguageFilter scores docs with the fastText lid.176.bin
model (src/datatrove/pipeline/filters/language_filter.py:11,49-62) inside a
per-process singleton. fastText is not installable here, so the engine's
*built-in* scorer is a deterministic function-word-profile classifier that
runs entirely in whole-stage codegen; `fasttext_filter.py` provides the
model-backed pandas-UDF path when the library is present (same output
schema, gated behind an import-try).

Semantics:
- score(lang) = |{w in words(lower(text)) : w in profile(lang)}| / n_words
- han-script override: if CJK chars / total chars > 0.3 -> language 'zh',
  score = that fraction (stopword profiles cannot see unsegmented han text)
- language  = argmax score (tie -> lexicographically largest, via max on
  (score, lang) pairs — identical rule in Spark and SQL); no hits -> 'und'
- keep iff language in cfg.languages and score >= cfg.threshold
  (language_filter.py keeps top-1 in set over a probability threshold; the
  heuristic's hit-ratio scale needs a lower default threshold — documented
  deviation, config.py TOKENIZer NOTE applies)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import LangIdConfig
from datatrove_spark.functions import text as T

NAME = "langid"

# public-knowledge function-word profiles (top closed-class words per language)
PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "on", "be", "at", "by", "had", "have", "this"),
    "de": ("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des",
           "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als", "auch"),
    "fr": ("de", "la", "le", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "dans", "qui", "par", "pour", "sur", "pas", "au", "ne"),
    "es": ("de", "la", "que", "el", "en", "y", "los", "del", "se", "las",
           "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como"),
    "it": ("di", "e", "il", "la", "che", "in", "un", "per", "non", "una",
           "sono", "con", "si", "da", "come", "anche", "più", "nel", "alla", "gli"),
    "pt": ("de", "a", "o", "que", "e", "do", "da", "em", "um", "para",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "dos"),
    "nl": ("de", "en", "van", "het", "een", "in", "is", "dat", "op", "te",
           "zijn", "met", "voor", "niet", "aan", "er", "om", "ook", "als", "dan"),
}

HAN_RE = "[一-鿿]"
HAN_FRAC_THRESHOLD = 0.3


def detect(text_col: Column, cfg: LangIdConfig = LangIdConfig()) -> Column:
    """struct(language string, score double) — score rounded to 6dp."""
    ws = T.words(F.lower(text_col))
    n_words = F.size(ws)
    pairs = F.array(
        *[
            F.struct(
                (F.size(F.filter(ws, lambda w: w.isin(*prof))).cast("double") / n_words).alias("score"),
                F.lit(lang).alias("language"),
            )
            for lang, prof in sorted(PROFILES.items())
        ]
    )
    best = F.array_max(pairs)
    han_frac = F.size(F.regexp_extract_all(text_col, F.lit(HAN_RE), 0)).cast("double") / F.length(text_col)
    score = F.when(han_frac > HAN_FRAC_THRESHOLD, han_frac).otherwise(best["score"])
    language = (
        F.when(han_frac > HAN_FRAC_THRESHOLD, "zh")
        .when(best["score"] > 0, best["language"])
        .otherwise("und")
    )
    return F.struct(language.alias("language"), F.round(score, 6).alias("language_score"))


def apply(df: DataFrame, text_col: str = "text", cfg: LangIdConfig = LangIdConfig()) -> DataFrame:
    d = detect(F.col(text_col), cfg)
    df = df.withColumn("language", d["language"]).withColumn("language_score", d["language_score"])
    keep = F.col("language").isin(*cfg.languages) & (F.col("language_score") >= cfg.threshold)
    return df.withColumn(
        f"{NAME}_reason", F.when(~keep, F.lit("lang_filter")).otherwise(F.lit(None).cast("string"))
    ).withColumn(f"{NAME}_keep", keep)


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: LangIdConfig = LangIdConfig(),
) -> str:
    pair_exprs = ", ".join(
        "{'score': len(list_filter(ws, w -> w IN (%s)))::DOUBLE / nullif(n_words, 0), 'language': '%s'}"
        % (", ".join(f"'{w}'" for w in prof), lang)
        for lang, prof in sorted(PROFILES.items())
    )
    langs = ", ".join(f"'{lg}'" for lg in cfg.languages)
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         regexp_extract_all(lower({text_col}), '\\S+') AS ws,
         len(regexp_extract_all(lower({text_col}), '\\S+')) AS n_words,
         len(regexp_extract_all({text_col}, '{HAN_RE}'))::DOUBLE / nullif(len({text_col}), 0) AS han_frac
  FROM {table}
), scored AS (
  SELECT id, han_frac, list_max([{pair_exprs}]) AS best
  FROM base
), res AS (
  SELECT id,
    CASE WHEN han_frac > {HAN_FRAC_THRESHOLD} THEN 'zh'
         WHEN best['score'] > 0 THEN best['language']
         ELSE 'und' END AS language,
    round(CASE WHEN han_frac > {HAN_FRAC_THRESHOLD} THEN han_frac ELSE best['score'] END, 6) AS language_score
  FROM scored
)
SELECT id AS {id_col}, language, language_score,
  (language IN ({langs}) AND language_score >= {cfg.threshold}) AS {NAME}_keep
FROM res
""".strip()
