"""Every examples/ script must run end-to-end on the shared session.

The examples are the reference's ``examples/`` directory re-expressed
Spark-first (one script per reference example; see each docstring for the
file-level mapping). Each exposes ``run(spark, ...)`` so these tests drive
the exact code paths the CLI wrappers use, against the sf0.001 testdata.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests.conftest import SF_SMALL

DOCS = f"{SF_SMALL}/documents.parquet"


def test_fineweb_example(spark, tmp_path):
    from examples import fineweb

    m = fineweb.run(spark, str(tmp_path), n_generate=300)
    assert m["total"] == 300
    assert 0 < m["kept"] <= 300
    assert m["deduped_docs"] <= m["kept"]
    assert m["dropped_by_reason"]  # synthetic pages include droppable docs


def test_process_common_crawl_dump_example(spark, tmp_path):
    from examples import process_common_crawl_dump as cc

    warc = str(tmp_path / "synth" / "dump.warc.gz")
    cc._synthesize_warc(spark, warc)
    n = cc.run(spark, warc, str(tmp_path / "out"))
    assert n > 0  # the synthetic pages distribution passes langid + gopher


def test_minhash_deduplication_example(spark, tmp_path):
    from examples import minhash_deduplication as mh

    m = mh.run(spark, DOCS, str(tmp_path))
    assert m["docs_out"] <= m["docs_in"] == 500
    assert m["tokens_out"] <= m["tokens_in"]


def test_sentence_deduplication_example(spark, tmp_path):
    from examples import sentence_deduplication as sd

    m = sd.run(spark, None, str(tmp_path), n_generate=400)
    assert 0 < m["docs_out"] <= m["docs_in"]


def test_url_deduplication_example(spark, tmp_path):
    from examples import url_deduplication as ud

    m = ud.run(spark, DOCS, str(tmp_path))
    assert 0 < m["docs_out"] < m["docs_in"]  # ~3.5 docs/url -> real dedup


def test_exact_substrings_example(spark, tmp_path):
    from examples import exact_substrings as es

    m = es.run(spark, DOCS, str(tmp_path))
    assert m["docs"] == 500 and m["words"] > 0 and m["removed_words"] >= 0


def test_tokenize_c4_example(spark, tmp_path):
    from examples import tokenize_c4 as tc

    m = tc.run(spark, DOCS, str(tmp_path))
    assert m["shards"] == 8 and m["tokens"] > 0


def test_tokenize_from_hf_example(spark, tmp_path):
    from examples import tokenize_from_hf as th

    m = th.run(spark, DOCS, str(tmp_path))
    assert m["docs"] == 500 and m["ds_shards"] == 4 and m["hub_shards"] >= 1


def test_cross_dump_dedup_example(spark, tmp_path):
    from examples import cross_dump_dedup as xd

    stats = xd.run(spark, "/root/testdata/sf0.001/documents.parquet", str(tmp_path / "xd"))
    assert stats["dump_0"]["in"] > 0 and stats["index_rows"] > 0
    for i in range(3):
        d = stats[f"dump_{i}"]
        assert 0 < d["kept"] <= d["in"]
    # falsifiable cross-dump property: later dumps drop duplicates of earlier
    # KEPT docs via the index, so their kept counts sit strictly below their
    # in counts (sf0.001 documents has known cross-stripe duplicates), and
    # the union of survivors equals plain full-corpus minhash dedup — on this
    # dataset the banded collisions close identically either way (163+162+151
    # = 476 = full-corpus kept)
    from datatrove_spark.operators import minhash

    assert stats["dump_1"]["kept"] < stats["dump_1"]["in"]
    assert stats["dump_2"]["kept"] < stats["dump_2"]["in"]
    total_kept = sum(stats[f"dump_{i}"]["kept"] for i in range(3))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full_kept = minhash.apply(docs).filter("minhash_keep").count()
    assert total_kept == full_kept


def test_multilingual_pretrain_prep_example(spark, tmp_path):
    from examples import multilingual_pretrain_prep as mp

    m = mp.run(spark, str(tmp_path / "ml"), n_generate=800)
    assert 0 < m["docs_out"] < m["docs_in"] == 800
    assert m["shards"] == 4 and m["tokens"] > 0
    # the temperature sampler must have kept more than one language
    assert len(m["kept_by_lang"]) >= 2
