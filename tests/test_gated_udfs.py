"""Every gated (library-backed) UDF factory must BUILD without its wheel —
the import failure may only happen at call time on executors. Guards the
PEP 563 string-annotation trap: `pd.Series` hints must resolve against
module globals when the pandas_udf decorator runs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gated_udf_factories_build(spark):
    from datatrove_spark.operators import extract, fasttext_filter, formatters, readability

    udfs = [
        extract.make_trafilatura_udf(),
        formatters.make_ftfy_udf(),
        fasttext_filter.make_fasttext_udf("/tmp/nonexistent-model.bin"),
        readability.make_readability_udf(),
    ]
    # and they must be attachable to a plan without evaluation
    df = spark.createDataFrame([(0, "text")], "doc_id long, text string")
    for udf in udfs:
        df.withColumn("out", udf(F.col("text")))


def test_ftfy_identity_fallback(spark):
    """ftfy is gated with an identity fallback, so this one is also safe to
    EXECUTE without the wheel."""
    from datatrove_spark.operators import formatters

    df = spark.createDataFrame([(0, "café"), (1, None)], "doc_id long, text string")
    out = df.withColumn("fixed", formatters.make_ftfy_udf()(F.col("text"))).collect()
    got = {r.doc_id: r.fixed for r in out}
    try:
        import ftfy  # noqa: F401
    except ImportError:
        assert got == {0: "café", 1: None}
    else:
        assert got[0] == "café"
