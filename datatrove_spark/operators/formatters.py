"""Text formatters — scalar text -> text projections (SURVEY.md §2.5).

- SymbolLinesFormatter (src/datatrove/pipeline/formatters/
  symbol_lines_remover.py:22-34): collapse consecutive lines consisting
  only of punctuation/symbols into `replace_char`. Fully native: split ->
  mark symbol-only lines -> run-collapse via lag comparison inside a
  higher-order fold -> rejoin.
- FTFYFormatter (formatters/ftfy.py): mojibake repair; gated behind an
  import-try (ftfy absent here), pandas-UDF batch body, identity fallback.

Engine symbol-line rule: a line is "symbol-only" when non-empty after
trimming and containing no alphanumeric character. Runs collapse to ONE
replace_char line. (The reference keys off its PUNCTUATION_SET,
utils/text.py:11-17; the no-alnum rule is the portable rendering.)
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves PEP 563 string annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.functions import text as T

NAME = "symbol_lines"


def remove_symbol_lines(text_col: Column, replace_char: str = "") -> Column:
    lns = T.lines(text_col)
    flagged = F.transform(
        lns,
        lambda ln: F.struct(
            ln.alias("ln"),
            ((T.trim_ws(ln) != "") & ~ln.rlike("[A-Za-z0-9]")).alias("sym"),
        ),
    )
    # keep a symbol line only if the previous line is not a symbol line;
    # kept symbol lines become replace_char (run-collapse)
    replaced = F.transform(
        flagged,
        lambda st, i: F.when(
            ~st["sym"], st["ln"]
        ).when(
            (i == 0) | ~F.element_at(flagged, i)["sym"],  # element_at(i) = previous (1-based)
            F.lit(replace_char),
        ).otherwise(F.lit(None).cast("string")),
    )
    return F.array_join(F.filter(replaced, lambda x: x.isNotNull()), "\n")


def apply(df: DataFrame, text_col: str = "text", replace_char: str = "") -> DataFrame:
    return df.withColumn(f"{NAME}_text", remove_symbol_lines(F.col(text_col), replace_char))


def oracle_sql(table: str, id_col: str = "doc_id", text_expr: str = "text", replace_char: str = "") -> str:
    strip = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
    list_transform(string_split({text_expr}, chr(10)),
      l -> {{'ln': l,
             'sym': trim(l, {strip}) != '' AND NOT regexp_matches(l, '[A-Za-z0-9]')}}) AS fl
  FROM {table}
), rep AS (
  SELECT id,
    list_filter(
      list_transform(fl, (st, i) -> CASE
        WHEN NOT st['sym'] THEN st['ln']
        WHEN i = 1 OR NOT fl[i - 1]['sym'] THEN '{replace_char}'
        ELSE NULL END),
      x -> x IS NOT NULL) AS kept
  FROM base
)
SELECT id AS {id_col}, coalesce(array_to_string(kept, chr(10)), '') AS {NAME}_text FROM rep
""".strip()


def make_ftfy_udf():
    """ftfy.fix_text batch UDF; identity when the library is absent."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def ftfy_fix(texts: pd.Series) -> pd.Series:
        try:
            import ftfy

            return texts.map(lambda t: ftfy.fix_text(t) if t is not None else None)
        except ImportError:
            return texts

    return ftfy_fix
