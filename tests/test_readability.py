"""Readability-style extractor: golden outputs, boilerplate stripping, the
min_text_length emptiness gate, and the gated library path's contract.

Models the reference's tests/pipeline/test_extractors.py (golden text per
input html) for the ReadabilityInscriptis analog (modular.py:35-51).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datatrove_spark.operators import readability

PAGE = (
    "<html><head><script>track();</script><style>a{}</style></head><body>"
    "<nav><a href='/'>Home</a> <a href='/about'>About</a></nav>"
    '<div id="sidebar-left">Subscribe to our newsletter today</div>'
    "<h1>Quarterly Results</h1>"
    "<p>Revenue grew twelve percent on strong cloud demand.</p>"
    "<p>Operating margin expanded &amp; guidance was raised.</p>"
    "<footer>Copyright 2024</footer>"
    "</body></html>"
)

GOLDEN = (
    "Quarterly Results\n"
    "Revenue grew twelve percent on strong cloud demand.\n"
    "Operating margin expanded & guidance was raised."
)


def _extract(spark, html: str | None, **kwargs):
    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    return readability.apply(df, **kwargs).collect()[0]["readability_text"]


def test_golden_output(spark):
    assert _extract(spark, PAGE) == GOLDEN


def test_boilerplate_blocks_removed(spark):
    out = _extract(spark, PAGE)
    for junk in ("Home", "About", "Subscribe", "Copyright", "track();"):
        assert junk not in out


def test_min_text_length_gate(spark):
    # too little surviving text -> NULL, the reference's empty-doc drop
    assert _extract(spark, "<html><body><p>tiny</p></body></html>") is None
    assert _extract(spark, None) is None


def test_max_new_lines(spark):
    html = "<p>alpha paragraph with enough words</p><div></div><div></div><div></div><p>omega paragraph with enough words</p>"
    out = _extract(spark, html)
    assert "\n\n\n" not in out
    assert out.startswith("alpha") and out.endswith("words")


def test_oracle_parity_crafted(spark):
    import duckdb

    docs = [(0, PAGE), (1, "<p>tiny</p>"), (2, None)]
    df = spark.createDataFrame(docs, "doc_id long, html string")
    s = sorted(
        tuple(r) for r in readability.apply(df).select("doc_id", "readability_text").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (doc_id BIGINT, html VARCHAR)")
    for i, h in docs:
        con.execute("INSERT INTO pages VALUES (?, ?)", [i, h])
    d = sorted(tuple(r) for r in con.execute(readability.oracle_sql("pages", "html")).fetchall())
    assert s == d


def test_library_path_gated(spark):
    """The parity UDF must build without the wheels and only fail (with
    ImportError inside the executor) when actually invoked."""
    udf = readability.make_readability_udf()
    df = spark.createDataFrame([(0, PAGE)], "doc_id long, html string")
    plan = df.withColumn("t", udf(F.col("html")))
    try:
        import inscriptis  # noqa: F401
        import readability as readability_lxml  # noqa: F401
    except ImportError:
        with pytest.raises(Exception, match="(?i)import|module"):
            plan.collect()
    else:
        out = plan.collect()[0]["t"]
        assert out is None or "Revenue" in out
