"""DSIR-style importance weighting for training-data selection.

Renders the hashed n-gram importance-resampling recipe of Xie et al.,
"Data Selection for Language Models via Importance Resampling" (NeurIPS
2023, arXiv:2302.03169) — public paper, no reference-library counterpart
(beyond-reference operator; the reference filters by heuristic rules only).

Recipe: featurize each document as hashed word uni+bigram counts over B
buckets; fit bag-of-hashed-ngrams models for the TARGET distribution (the
docs matching a target predicate, e.g. a trusted domain) and the RAW
distribution (the whole corpus); a document's importance score is

    log p_target(doc) - log p_raw(doc)
      = sum over gram occurrences of [ ln p_t(bucket) - ln p_r(bucket) ]

with Laplace-smoothed bucket probabilities. Select the top-k raw docs by
score (the paper samples Gumbel-perturbed weights; the deterministic top-k
variant is its zero-temperature limit and the only cross-engine-reproducible
one — noted deviation, same as the engine's hash SamplerFilter).

Determinism/scale contract (the ngram_lm discipline, ngram_lm.py):
- gram->bucket hashing is the portable h60 mod B — one Arrow kernel pass,
  never a corpus-wide interpreted HOF;
- per-gram log-ratios quantize to integer micro-units (round(ln(x)*1e6) as
  int64) and SUM IN INT64, so per-doc scores are addition-order-free and
  bit-identical across Spark partitionings and DuckDB;
- the bucket-weight table is bounded by B (default 8192 rows) and
  broadcasts into the scoring join — the corpus shuffles only its
  map-side-combined (doc, micro-sum) rows;
- like ngram_lm, the corpus token stream is scanned twice (model build +
  scoring) — both scans are shuffle-light and the alternative (persisting
  the exploded gram stream) measured slower there;
- top-k selection is orderBy+limit (TakeOrdered — a distributed partial
  top-k per partition then a k-row merge, never a single-partition window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datatrove_spark.functions.hashing import py_hash60, sql_hash60

NAME = "dsir"

DEFAULT_BUCKETS = 8192
ALPHA = 0.5  # Laplace smoothing per bucket
MICRO = 1_000_000


def py_gram_buckets(text: str | None, n_buckets: int = DEFAULT_BUCKETS) -> list[int]:
    """Per-doc kernel: hashed buckets of word unigrams + bigrams (with
    multiplicity — DSIR features are counts, not sets)."""
    from datatrove_spark.reference_impl.filters import simplify_text

    ws = simplify_text(text or "").split()
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [py_hash60(g) % n_buckets for g in grams]


def _bucket_udf(n_buckets: int):
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(texts: pd.Series) -> pd.Series:
        from datatrove_spark.operators.dsir import py_gram_buckets

        return texts.map(lambda t: py_gram_buckets(t, n_buckets))

    return buckets


def _weights(
    df: DataFrame, target: Column, text_col: str, n_buckets: int
) -> DataFrame:
    """(bucket, w) — integer-micro log-ratio weights, <= n_buckets rows.
    One exploded pass computes both models: count(*) is the raw count,
    conditional count the target count; totals fold in as an unpartitioned
    window over the bounded bucket table (the unigram_logprob vocab-total
    trick — cheap because the table is already tiny)."""
    kern = _bucket_udf(n_buckets)
    feats = df.select(target.alias("__t"), F.explode(kern(F.col(text_col))).alias("bucket"))
    agg = feats.groupBy("bucket").agg(
        F.count("*").alias("raw_n"),
        F.count_if(F.col("__t")).alias("tgt_n"),
    )
    tot = Window.partitionBy()
    raw_tot = F.sum("raw_n").over(tot)
    tgt_tot = F.sum("tgt_n").over(tot)
    lp_t = F.log((F.col("tgt_n") + F.lit(ALPHA)) / (tgt_tot + F.lit(ALPHA * n_buckets)))
    lp_r = F.log((F.col("raw_n") + F.lit(ALPHA)) / (raw_tot + F.lit(ALPHA * n_buckets)))
    return agg.select(
        "bucket", F.round((lp_t - lp_r) * MICRO).cast("long").alias("w")
    )


def scores(
    df: DataFrame,
    target: Column | str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, dsir_micro, dsir_score) for every document; gram-less docs score
    0. Every gram of every doc exists in the weight table by construction
    (the raw model IS the corpus), so the scoring join is lossless."""
    if isinstance(target, str):
        target = F.expr(target)
    w = _weights(df, target, text_col, n_buckets)
    kern = _bucket_udf(n_buckets)
    feats = df.select(F.col(id_col), F.explode(kern(F.col(text_col))).alias("bucket"))
    per_doc = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w").alias("dsir_micro"))
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("dsir_micro"), F.lit(0)).cast("long").alias("dsir_micro"),
        F.round(F.coalesce(F.col("dsir_micro"), F.lit(0)) / MICRO, 6).alias("dsir_score"),
    )


def select_topk(
    df: DataFrame,
    target: Column | str,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """The k most target-like documents, score-descending (ties -> smaller
    id). orderBy+limit plans as TakeOrdered: per-partition top-k, k-row
    merge — no global sort, no single-partition window."""
    s = scores(df, target, id_col, text_col, n_buckets)
    return s.orderBy(F.col("dsir_micro").desc(), F.col(id_col).asc()).limit(k)


# --- DuckDB oracles -----------------------------------------------------------

_SIMPLIFY = (
    "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9]+', ' ', 'g'), '[0-9]+', '0', 'g'))"
)


def _sql_scores(
    table: str, target_sql: str, id_col: str, text_col: str, n_buckets: int
) -> str:
    simp = _SIMPLIFY.format(t=text_col)
    ws = f"regexp_extract_all({simp}, '\\S+')"
    bigrams = (
        f"list_transform(range(1, greatest(len({ws}) - 1, 0) + 1), "
        f"i -> ({ws})[i] || ' ' || ({ws})[i+1])"
    )
    buckets = f"list_transform(list_concat({ws}, {bigrams}), g -> {sql_hash60('g')} % {n_buckets})"
    return f"""
feats AS (
  SELECT {id_col} AS id, ({target_sql}) AS is_t, unnest({buckets}) AS bucket FROM {table}
), agg AS (
  SELECT bucket, count(*) AS raw_n, count(*) FILTER (WHERE is_t) AS tgt_n FROM feats GROUP BY bucket
), wt AS (
  SELECT bucket,
    round((ln((tgt_n + {ALPHA}) / (sum(tgt_n) OVER () + {ALPHA * n_buckets}))
         - ln((raw_n + {ALPHA}) / (sum(raw_n) OVER () + {ALPHA * n_buckets}))) * {MICRO})::BIGINT AS w
  FROM agg
), per_doc AS (
  SELECT f.id, sum(w.w) AS micro FROM feats f JOIN wt w USING (bucket) GROUP BY f.id
), sc AS (
  SELECT d.{id_col}, coalesce(p.micro, 0)::BIGINT AS dsir_micro,
         round(coalesce(p.micro, 0) / {MICRO}.0, 6) AS dsir_score
  FROM {table} d LEFT JOIN per_doc p ON d.{id_col} = p.id
)
""".strip()


def oracle_sql_scores(
    table: str = "documents",
    target_sql: str = "lang = 'en'",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    body = _sql_scores(table, target_sql, id_col, text_col, n_buckets)
    return f"WITH {body}\nSELECT {id_col}, dsir_micro, dsir_score FROM sc"


def oracle_sql_topk(
    table: str = "documents",
    target_sql: str = "lang = 'en'",
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> str:
    body = _sql_scores(table, target_sql, id_col, text_col, n_buckets)
    return (
        f"WITH {body}\nSELECT {id_col}, dsir_micro, dsir_score FROM sc "
        f"ORDER BY dsir_micro DESC, {id_col} ASC LIMIT {k}"
    )
