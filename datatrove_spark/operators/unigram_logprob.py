"""Unigram log-probability scorer (perplexity-style quality signal).

Reference: UnigramLogProbFilter (src/datatrove/pipeline/filters/
unigram_log_probs.py:62-79) scores docs by the mean log P(word) under a
downloaded Google-1T unigram table and keeps docs above -10. This engine is
self-contained: the unigram model is computed FROM the corpus itself
(two-phase distributed aggregation), then joined back — the idiomatic Spark
rendering of "broadcast freq table + per-doc mean" that also exercises the
engine's scale patterns:

- vocabulary build: explode(words) -> groupBy(word).count() — map-side
  partial aggregation collapses each partition's repeats before the shuffle,
  so shuffle volume is O(|vocab per partition|), not O(corpus tokens);
- scoring join: exploded words joined to the vocab table with an explicit
  ``F.broadcast`` hint (vocabularies are tiny relative to a 100 TB corpus);
- per-doc mean: ln(freq) values are quantized to integer micro-units and
  summed exactly in int64, NOT avg()'d as doubles — float addition is
  order-sensitive and a shuffle-order-dependent mean would break the
  engine's determinism contract (identical results at any parallelism).

Keep iff mean > cfg.logprobs_threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import UnigramLogProbConfig
from datatrove_spark.functions import text as T

NAME = "unigram_logprob"


def word_freqs(
    df: DataFrame, text_col: str = "text", max_vocab: int = UnigramLogProbConfig.max_vocab
) -> DataFrame:
    """(word, freq) relative-frequency table over the lowercased corpus,
    capped to the top ``max_vocab`` words (count desc, word asc tie-break).

    The cap bounds the broadcast side independent of corpus size: web-scale
    distinct-token counts are dominated by a typo/garbage tail that a
    frequency table should not carry (the reference's table is likewise a
    fixed finite word list). ``orderBy().limit()`` plans as
    TakeOrderedAndProject — per-partition top-N merged once, no global sort
    shuffle. Frequencies are relative to the CAPPED table's total, matching
    the reference's ``count / total_count`` over its own table."""
    words = df.select(F.explode(T.words(F.lower(F.col(text_col)))).alias("word"))
    counts = words.groupBy("word").agg(F.count("*").alias("c"))
    capped = counts.orderBy(F.desc("c"), F.asc("word")).limit(max_vocab)
    total = capped.agg(F.sum("c").alias("t"))
    return capped.crossJoin(F.broadcast(total)).select(
        "word", (F.col("c").cast("double") / F.col("t")).alias("freq")
    )


def apply(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: UnigramLogProbConfig = UnigramLogProbConfig(),
) -> DataFrame:
    freqs = word_freqs(df, text_col, cfg.max_vocab)
    exploded = df.select(id_col, F.explode(T.words(F.lower(F.col(text_col)))).alias("word"))
    # left join: out-of-vocabulary words (beyond the cap) score unknown_freq,
    # the reference's .get(word, 1e-9) — they still count toward the mean.
    scored = exploded.join(F.broadcast(freqs), "word", "left").withColumn(
        "freq", F.coalesce(F.col("freq"), F.lit(cfg.unknown_freq))
    )
    # ln values quantized to integer micro-units -> the sum is exact integer
    # arithmetic, immune to shuffle order (determinism contract).
    micro = F.round(F.log("freq") * 1_000_000).cast("long")
    per_doc = (
        scored.groupBy(id_col)
        .agg(F.sum(micro).alias("s"), F.count("*").alias("n"))
        .select(
            id_col,
            F.round(F.col("s").cast("double") / 1_000_000 / F.col("n"), 4).alias("unigram_logprob"),
        )
    )
    out = df.join(per_doc, id_col, "left").withColumn(
        "unigram_logprob", F.coalesce(F.col("unigram_logprob"), F.lit(0.0))
    )
    keep = F.col("unigram_logprob") > cfg.logprobs_threshold
    return out.withColumn(
        f"{NAME}_reason", F.when(~keep, "unigram_log_probs").otherwise(F.lit(None).cast("string"))
    ).withColumn(f"{NAME}_keep", keep)


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: UnigramLogProbConfig = UnigramLogProbConfig(),
) -> str:
    return f"""
WITH ex AS (
  SELECT {id_col} AS id, unnest(regexp_extract_all(lower({text_col}), '\\S+')) AS word
  FROM {table}
), capped AS (
  SELECT word, count(*) AS c FROM ex GROUP BY 1
  ORDER BY c DESC, word ASC LIMIT {cfg.max_vocab}
), vocab AS (
  SELECT word, c::DOUBLE / (SELECT sum(c) FROM capped) AS freq FROM capped
), folded AS (
  SELECT e.id,
         round(sum(round(ln(coalesce(v.freq, {cfg.unknown_freq})) * 1000000)::BIGINT)::DOUBLE / 1000000 / count(*), 4) AS unigram_logprob
  FROM ex e LEFT JOIN vocab v USING (word) GROUP BY 1
)
SELECT t.{id_col},
  coalesce(f.unigram_logprob, 0.0) AS unigram_logprob,
  (coalesce(f.unigram_logprob, 0.0) > {cfg.logprobs_threshold}) AS {NAME}_keep
FROM {table} t LEFT JOIN folded f ON t.{id_col} = f.id
""".strip()
