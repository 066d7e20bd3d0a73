"""Sentence-span dedup: rewrite correctness, first-occurrence-wins, parity."""

from __future__ import annotations

import pytest

from datatrove_spark.operators import sentence_dedup

S = (
    "The morning sun rose over the quiet hills. Farmers walked slowly to their wide fields. "
    "Children laughed on the way to the village school. The baker opened his shop with a smile. "
    "Fresh bread filled the cold air with warmth. Everyone greeted their neighbors happily there."
)
EXTRA = (
    " A completely new sentence closes this one. Another unique thought follows right here. "
    "And a third different line ends the piece."
)

DOCS = [
    (0, S + EXTRA),          # first occurrence of the shared spans -> kept intact
    (1, S + " Totally different tail sentence for doc one. More unique words follow in this spot. "
            "Final unique closer for document one here."),  # shares the S spans -> S removed
    (2, "Unrelated text with enough words to stay alive in the corpus today. "
        "It keeps talking about other things entirely for a while longer now. "
        "Three proper sentences should be quite enough words here honestly speaking, "
        "assuming the word count threshold is met by this lengthy final sentence which "
        "rambles on and on about nothing much at all until it finally stops."),
    (3, "Too short."),        # < 3 sentences -> no spans; dropped by min rules
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_first_occurrence_wins_and_rewrite(spark, corpus):
    out = {
        r.doc_id: (r.sentence_dedup_keep, r.sentence_dedup_text)
        for r in sentence_dedup.apply(corpus).collect()
    }
    # doc 0 untouched (it is the first occurrence)
    assert out[0][1] == DOCS[0][1]
    assert out[0][0] is True
    # doc 1 lost the duplicated S spans but kept its unique tail
    assert "morning sun" not in out[1][1]
    assert "Totally different tail" in out[1][1]
    # doc 2 untouched
    assert out[2][1] == DOCS[2][1]
    # doc 3: too short -> dropped, text unchanged (no spans to remove)
    assert out[3][0] is False


def test_oracle_parity(spark, corpus):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    s = sorted(
        tuple(r)
        for r in sentence_dedup.apply(corpus)
        .select("doc_id", "sentence_dedup_text", "sentence_dedup_keep")
        .collect()
    )
    d = sorted(tuple(r) for r in con.execute(sentence_dedup.oracle_sql()).fetchall())
    assert s == d
