"""Bloom-filter dedup + exact-substrings: crafted-doc semantics pinned to the
reference behaviors, plus a direct parity run against the reference's own
SingleBloomFilter (FP-free regime).

Word generators are digit-free on purpose: dedup canonicalization collapses
digit runs to '0' (simplify_text), so 'word1 word2' would alias to 'word0'.
"""

from __future__ import annotations

import pytest

from datatrove_spark.operators import bloom_dedup, exact_substrings
from datatrove_spark.reference_impl import harness


def _w(prefix: str, n: int, start: int = 0) -> str:
    """n distinct digit-free words: prefix + base-26 letter suffix."""
    return " ".join(
        f"{prefix}{chr(97 + (i // 26) % 26)}{chr(97 + i % 26)}" for i in range(start, start + n)
    )


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- bloom

def _bloom_rows(spark, texts, **kw):
    out = bloom_dedup.apply(_docs_df(spark, texts), **kw)
    return {r.doc_id: r for r in out.collect()}


def test_bloom_identical_doc_dropped(spark):
    a = _w("alpha", 30)
    rows = _bloom_rows(spark, [a, a, _w("beta", 30)])
    assert rows[0].bloom_dedup_keep and rows[0].bloom_dup_frac == 0.0
    assert not rows[1].bloom_dedup_keep and rows[1].bloom_dup_frac == 1.0
    assert rows[2].bloom_dedup_keep


def test_bloom_within_doc_repeats_do_not_self_collide(spark):
    # update_bf runs after the doc's query loop (bloom_filter.py:178-185):
    # a doc repeating its own 13-gram is NOT a duplicate of itself.
    t = _w("gamma", 13) + " zzz " + _w("gamma", 13)
    rows = _bloom_rows(spark, [t])
    assert rows[0].bloom_dup_frac == 0.0 and rows[0].bloom_dedup_keep


def test_bloom_partial_overlap_below_threshold_keeps(spark):
    # doc1 = doc0's 40 words + 40 novel words: only the 28 pure-doc0 grams
    # of its 68 are duplicates -> frac ~0.41 -> kept.
    base, extra = _w("delta", 40), _w("epsi", 40)
    rows = _bloom_rows(spark, [base, base + " " + extra])
    assert rows[1].bloom_dup_frac == pytest.approx(28 / 68)
    assert rows[1].bloom_dedup_keep


def test_bloom_dropped_doc_still_inserts_shingles(spark):
    # n=5: doc1 = base(40) + novel(6) -> 42 shingles, 36 dup -> frac ~0.857
    # -> DROPPED; its 6 novel words' shingles are inserted anyway
    # (bloom_filter.py:184 inserts before the drop decision), so doc2
    # consisting of exactly those 6 words is 100% duplicate.
    base, novel = _w("zeta", 40), _w("eta", 6)
    rows = _bloom_rows(spark, [base, base + " " + novel, novel], n=5)
    assert not rows[1].bloom_dedup_keep
    assert rows[1].bloom_dup_frac == pytest.approx(36 / 42)
    assert not rows[2].bloom_dedup_keep and rows[2].bloom_dup_frac == 1.0


def test_bloom_short_and_null_docs_keep(spark):
    rows = _bloom_rows(spark, ["one two three", None, ""])
    for i in range(3):
        assert rows[i].bloom_dedup_keep and rows[i].bloom_dup_frac == 0.0


def test_bloom_threshold_boundary(spark):
    # frac must be STRICTLY greater than threshold to drop (reference :186).
    a = _w("theta", 20)  # 8 shingles of 13-grams
    rows = _bloom_rows(spark, [a, a + " novelx novely"])  # 10 shingles, 8 dup
    assert rows[1].bloom_dup_frac == pytest.approx(0.8)
    assert rows[1].bloom_dedup_keep  # 0.8 > 0.8 is False


@pytest.mark.skipif(not harness.available(), reason="reference repo not present")
def test_bloom_parity_vs_reference():
    """Run the reference's SingleBloomFilter (large power-of-two mask, sha1
    hashes — xxhash is harness-stubbed — so the FP probability is ~1e-20)
    over plain-lowercase docs where both tokenizers agree; keep/drop must
    match bloom_dedup's ideal-bloom semantics doc for doc."""
    harness.install()
    from datatrove.data import Document
    from datatrove.pipeline.dedup.bloom_filter import BloomFilterConfig, SingleBloomFilter
    from datatrove.utils.hashing import HashConfig

    base, extra = _w("word", 40), _w("other", 40)
    texts = [
        base,
        base,                                      # exact dup -> drop
        base + " " + extra,                        # frac ~0.41 -> keep
        extra,                                     # all grams seen in doc2 -> drop
        _w("fresh", 40),                           # novel -> keep
        "short doc",                               # no shingles -> keep
        _w("word", 20) + " mixed tail " + _w("fresh", 5),  # frac 8/15 -> keep
    ]
    bf = SingleBloomFilter(
        output_folder="/tmp/bloom-parity",
        config=BloomFilterConfig(
            m_bytes=(1 << 22) - 1,
            k=6,
            hash_config=HashConfig(precision=32, hash_fc="sha1"),
        ),
    )
    ref_keep = [bf.step(Document(text=t, id=str(i))) for i, t in enumerate(texts)]
    assert ref_keep == [True, False, True, False, True, True, True]

    from datatrove_spark.session import get_spark

    spark = get_spark(app_name="datatrove-spark-tests", master="local[4]", shuffle_partitions=4)
    rows = _bloom_rows(spark, texts)
    assert [rows[i].bloom_dedup_keep for i in range(len(texts))] == ref_keep


# ------------------------------------------------------- exact substrings

def _es_rows(spark, texts, length):
    out = exact_substrings.apply(_docs_df(spark, texts), length=length)
    return {r.doc_id: r for r in out.collect()}


def test_es_shared_span_removed_from_all_occurrences(spark):
    shared = _w("dup", 10)
    t0 = _w("aa", 5) + " " + shared + " " + _w("bb", 5)
    t1 = _w("cc", 5) + " " + shared + " " + _w("dd", 5)
    rows = _es_rows(spark, [t0, t1], length=10)
    # every occurrence removed, including the first (reference removes all)
    assert rows[0].es_text == _w("aa", 5) + " " + _w("bb", 5)
    assert rows[1].es_text == _w("cc", 5) + " " + _w("dd", 5)
    assert rows[0].n_removed == 10 and rows[1].n_removed == 10
    assert rows[0].n_words == 20


def test_es_longer_span_fully_covered(spark):
    # A duplicated span of M > L tokens is covered end-to-end by its
    # M-L+1 duplicated L-grams -> all M tokens cut, not just L.
    shared = _w("ss", 17)
    rows = _es_rows(spark, [shared + " " + _w("xx", 3), _w("yy", 3) + " " + shared], length=10)
    assert rows[0].es_text == _w("xx", 3)
    assert rows[1].es_text == _w("yy", 3)
    assert rows[0].n_removed == 17


def test_es_within_doc_repeat_and_periodic(spark):
    # self-similarity inside one doc counts (suffix-array semantics)
    rep = _w("rr", 10)
    rows = _es_rows(spark, [rep + " mid " + rep], length=10)
    assert rows[0].es_text == "mid"
    # periodic text: every L-gram repeats -> everything cut
    rows = _es_rows(spark, ["aaa " * 30], length=10)
    assert rows[0].es_text == "" and rows[0].n_removed == 30


def test_es_short_doc_untouched(spark):
    rows = _es_rows(spark, [_w("qq", 9), None, ""], length=10)
    assert rows[0].es_text == _w("qq", 9) and rows[0].n_removed == 0
    assert rows[1].es_text == "" and rows[1].n_words == 0
    assert rows[2].es_text == ""


def test_es_interval_merge_invariant(spark):
    # n_removed always equals n_words - len(es_text.split())
    texts = [
        _w("aa", 30) + " " + _w("bb", 12) + " " + _w("aa", 30),
        _w("bb", 12) + " tailx taily",
        _w("cc", 25),
    ]
    rows = _es_rows(spark, texts, length=12)
    for r in rows.values():
        assert r.n_removed == r.n_words - len(r.es_text.split())
