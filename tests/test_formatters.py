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


def test_toxicity_scrub_contract(spark):
    from datatrove_spark.operators.c4_badwords import apply_scrub, py_scrub_toxicity

    rows = [
        (0, "en", "Buy VIAGRA now, viagra viagra!"),
        (1, "en", "clean text entirely."),
        (2, "zh", "这里有色情内容和色情广告"),
        (3, "xx", "viagra stays for unknown language"),
        (4, None, "NULL lang viagra falls back to en"),
        (5, "de", "ein PORNO und noch ein porno"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r.toxicity_text for r in apply_scrub(df).collect()}
    for i, lg, t in rows:
        assert got[i] == py_scrub_toxicity(t, lg), (i, got[i])
    assert "[removed]" in got[0] and "VIAGRA" not in got[0]
    assert got[1] == "clean text entirely."
    assert "色情" not in got[2]
    assert got[3] == "viagra stays for unknown language"
    assert "[removed]" in got[4]
