"""Symbol-line run-collapse semantics (reference test_symbollines.py style)."""

from __future__ import annotations

from datatrove_spark.operators import formatters


def run(spark, text, replace_char=""):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return formatters.apply(df, replace_char=replace_char).collect()[0].symbol_lines_text


def test_collapse_run(spark):
    assert run(spark, "keep me.\n***\n---\n+++\nand me.") == "keep me.\n\nand me."


def test_replace_char(spark):
    assert run(spark, "a line.\n***\nanother.", replace_char="-") == "a line.\n-\nanother."


def test_separate_runs(spark):
    assert run(spark, "x.\n!!\ny.\n??\nz.") == "x.\n\ny.\n\nz."


def test_no_symbol_lines_untouched(spark):
    t = "plain text.\nwith two lines."
    assert run(spark, t) == t


def test_empty_lines_not_symbol(spark):
    t = "a.\n\nb."
    assert run(spark, t) == t
