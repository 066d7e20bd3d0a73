"""Driver-shaped correctness gate: for every registry entry with a SQL
oracle, run the Spark query and the DuckDB oracle on the same parquet tables
and compare row sets exactly (the driver hashes sorted values; we compare the
values themselves for debuggable failures)."""

from __future__ import annotations

import math

import pytest

from datatrove_spark import registry
from tests.conftest import SF_MEDIUM, SF_SMALL

ORACLES = registry.oracle_sql()
NAMES = sorted(registry.queries())


def normalize(rows, columns):
    """Sort columns by name, then rows; normalize NaN/float for comparison."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [c for c in sorted(columns)], out


def run_compare(spark, duck, name, sf_dir):
    fn = registry.queries()[name]
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(ORACLES[name])
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    sc, sr = normalize(s_rows, s_cols)
    dc, dr = normalize(d_rows, d_cols)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    mism = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mism, f"{name}: {len(mism)} row mismatches; first: {mism[0]}"


@pytest.mark.parametrize("name", [n for n in NAMES if n in ORACLES])
def test_oracle_parity_small(spark, duck_small, name):
    run_compare(spark, duck_small, name, SF_SMALL)


@pytest.mark.parametrize("name", [n for n in NAMES if n in ORACLES])
def test_oracle_parity_medium(spark, duck_medium, name):
    run_compare(spark, duck_medium, name, SF_MEDIUM)


@pytest.mark.parametrize("name", [n for n in NAMES if n not in ORACLES])
def test_rows_only(spark, name):
    """Entries without a SQL oracle must still run and return a stable schema."""
    fn = registry.queries()[name]
    df = fn(spark, SF_SMALL)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())


LANGID_DOCS = [
    (0, "the cat was on the mat and it was the best of days for all of the town"),
    (1, "der hund und die katze sind mit dem kind auf der wiese und das ist auch gut"),
    (2, "и он сказал что это было на самом деле не так как мы думали но для нас"),
    (3, "yang penting adalah bahwa mereka tidak akan pergi dari tempat ini dengan cepat"),
    (4, "هذا النص في اللغة العربية و هو من أجل أن يكون على صلة مع كل ما بعد ذلك"),
    (5, "यह एक हिंदी वाक्य है और इस में के की से का और पर जैसे शब्द हैं"),
    (6, "これはにほんごのぶんしょうです、ひらがながたくさんあります"),
    (7, "한국어 문장입니다 그리고 한글이 많이 있습니다"),
    (8, "ประโยคภาษาไทยไม่มีช่องว่างระหว่างคำ"),
    (9, "这是一个中文句子没有空格"),
    (10, "zqx wvu kjh"),  # no profile hits -> und
]

LANGID_WANT = {0: "en", 1: "de", 2: "ru", 3: "id", 4: "ar", 5: "hi",
               6: "ja", 7: "ko", 8: "th", 9: "zh", 10: "und"}


def test_langid_wide_coverage(spark, duck_small):
    """21 function-word profiles + script overrides classify crafted docs,
    and Spark matches the DuckDB oracle on them."""
    from datatrove_spark.operators import langid

    df = spark.createDataFrame(LANGID_DOCS, "doc_id long, text string")
    got = {r.doc_id: r.language for r in langid.apply(df).collect()}
    assert got == LANGID_WANT

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in LANGID_DOCS:
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    s = sorted(
        tuple(r)
        for r in langid.apply(df).select("doc_id", "language", "language_score", "langid_keep").collect()
    )
    d = sorted(tuple(r) for r in con.execute(langid.oracle_sql()).fetchall())
    assert s == d


def test_langid_kernel_matches_native(spark):
    """The Arrow-batched py_langid hot path is bit-identical to the
    declarative detect() twin on real docs, crafted script docs, and the
    NULL/empty/whitespace edges."""
    from datatrove_spark.operators import langid

    edges = [(1000, None), (1001, ""), (1002, "   \n\t  "), (1003, "xqzt blorp")]
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text").union(
        spark.createDataFrame(LANGID_DOCS + edges, "doc_id long, text string")
    )
    cols = ["doc_id", "language", "language_score", "langid_keep", "langid_reason"]
    a = sorted(tuple(r) for r in langid.apply(df).select(cols).collect())
    b = sorted(tuple(r) for r in langid.apply_native(df).select(cols).collect())
    assert a == b
