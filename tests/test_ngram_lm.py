"""Bigram stupid-backoff LM: model-table bounds, backoff semantics, parity."""

from __future__ import annotations

import math

import pytest

from datatrove_spark.operators import ngram_lm
from datatrove_spark.operators.ngram_lm import NgramLMConfig

DOCS = [
    (0, "the cat sat on the mat and the cat slept"),
    (1, "the cat sat on the mat"),  # all transitions seen often -> high logprob
    (2, "zyzzyva qwok the flib"),  # rare words -> backoff + OOV under caps
    (3, ""),
    (4, "the the the the"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_model_tables_bounded(spark, corpus):
    big = corpus.union(corpus).union(corpus)
    cfg = NgramLMConfig(max_vocab=4, max_bigrams=5)
    for df in (corpus, big):
        uni, bi = ngram_lm.model_tables(df, cfg=cfg)
        assert uni.count() == 4
        assert bi.count() == 5
    uni, _ = ngram_lm.model_tables(corpus, cfg=cfg)
    assert {r.word for r in uni.collect()} >= {"the"}  # top by count always in


def test_scores_and_backoff(spark, corpus):
    out = {r.doc_id: r for r in ngram_lm.apply(corpus).collect()}
    # empty doc: 0 tokens -> logprob 0, perplexity 1, kept
    assert out[3].ngram_logprob == 0.0 and out[3].ngram_perplexity == 1.0
    # fluent doc scores higher than the rare-word doc
    assert out[1].ngram_logprob > out[2].ngram_logprob
    # "the the" transitions are seen (doc 4) -> logprob well above OOV floor
    assert out[4].ngram_logprob > math.log(1e-9) / 2
    assert out[0].ngram_perplexity == pytest.approx(
        round(math.exp(-out[0].ngram_logprob), 4), abs=1e-4
    )


def test_threshold_reason(spark, corpus):
    cfg = NgramLMConfig(logprobs_threshold=-1.0)
    out = {r.doc_id: (r.ngram_lm_keep, r.ngram_lm_reason) for r in ngram_lm.apply(corpus, cfg=cfg).collect()}
    assert out[2] == (False, "ngram_perplexity")
    assert out[3] == (True, None)


@pytest.mark.parametrize("cfg", [NgramLMConfig(), NgramLMConfig(max_vocab=3, max_bigrams=4)])
def test_oracle_parity_capped(spark, corpus, cfg):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    s = sorted(
        tuple(r)
        for r in ngram_lm.apply(corpus, cfg=cfg)
        .select("doc_id", "ngram_logprob", "ngram_perplexity", "ngram_lm_keep")
        .collect()
    )
    d = sorted(tuple(r) for r in con.execute(ngram_lm.oracle_sql(cfg=cfg)).fetchall())
    assert s == d
