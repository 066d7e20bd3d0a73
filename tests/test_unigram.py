"""Unigram log-prob: bounded-vocabulary semantics and DuckDB parity.

The broadcast side must stay bounded by cfg.max_vocab regardless of corpus
size (at web scale the distinct-token tail is billions of rows); words
beyond the cap take cfg.unknown_freq, the reference's .get(word, 1e-9)
(unigram_log_probs.py:64).
"""

from __future__ import annotations

import pytest

from datatrove_spark.config import UnigramLogProbConfig
from datatrove_spark.operators import unigram_logprob

DOCS = [
    (0, "the the the cat sat on the mat"),
    (1, "the cat purred and the dog barked loudly"),
    (2, "zyzzyva qwertyuiop asdfghjkl"),  # rare-tail words only
    (3, ""),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_vocab_bounded(spark, corpus):
    # duplicating the corpus must not grow the capped vocab
    big = corpus.union(corpus).union(corpus)
    for df in (corpus, big):
        vocab = unigram_logprob.word_freqs(df, max_vocab=3).collect()
        assert len(vocab) == 3
    # deterministic top-N: highest counts, ties broken by word asc
    words = {r.word for r in unigram_logprob.word_freqs(corpus, max_vocab=3).collect()}
    assert "the" in words  # count 6, always in


@pytest.mark.parametrize("max_vocab", [3, 1000])
def test_capped_parity(spark, corpus, max_vocab):
    import duckdb

    cfg = UnigramLogProbConfig(max_vocab=max_vocab)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    s = sorted(
        tuple(r)
        for r in unigram_logprob.apply(corpus, cfg=cfg)
        .select("doc_id", "unigram_logprob", "unigram_logprob_keep")
        .collect()
    )
    d = sorted(tuple(r) for r in con.execute(unigram_logprob.oracle_sql(cfg=cfg)).fetchall())
    assert s == d


def test_oov_words_score_unknown_freq(spark, corpus):
    # with a tiny cap, doc 2 (all rare words) is scored entirely at
    # unknown_freq: mean = ln(1e-9) quantized
    import math

    cfg = UnigramLogProbConfig(max_vocab=2)
    out = {
        r.doc_id: r.unigram_logprob
        for r in unigram_logprob.apply(corpus, cfg=cfg).collect()
    }
    expected = round(round(math.log(cfg.unknown_freq) * 1e6) / 1e6, 4)
    assert out[2] == pytest.approx(expected)
    assert out[3] == 0.0  # empty doc -> no words -> 0 (reference: len==0 -> 0)
