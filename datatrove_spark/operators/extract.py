"""HTML → text extraction.

Reference extractors (src/datatrove/pipeline/extractors/): Trafilatura
(trafilatura.py:38-55) and ReadabilityInscriptis (modular.py:35-51), each a
per-doc library call under a watchdog timeout (base.py:48-56).

Engine paths:
1. ``extract_text`` — built-in, fully native tag-stripper: drop
   <script>/<style>/<!-- --> blocks, strip tags, decode common entities,
   collapse whitespace. Declarative regexp_replace chain in whole-stage
   codegen; the always-available baseline with an exact DuckDB mirror.
2. ``make_trafilatura_udf`` — the library-backed path (same contract as
   the reference's Trafilatura extractor) inside an Arrow-batched pandas
   UDF with a per-executor import and per-doc timeout; gated behind an
   import-try because trafilatura is not installed in this environment.

Both consume a BINARY html column (input_hint schema) decoded as UTF-8.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf must resolve the 'pd.Series'
# string annotations (PEP 563) against module globals at decoration time
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NAME = "extract"

_ENTITIES = (
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
)


def extract_text(html_col: Column) -> Column:
    """Native extraction from a BINARY (or STRING) html column."""
    s = html_col.cast("string")
    s = F.regexp_replace(s, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    # block-level closers become newlines so paragraph structure survives
    s = F.regexp_replace(s, r"(?i)</(p|div|h[1-6]|li|tr|br)>|<br\s*/?>", "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[ \t\x0b\x0c\r]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{3,}", "\n\n")
    return F.regexp_replace(F.regexp_replace(s, r"^\s+", ""), r"\s+$", "")


def apply(df: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    return df.withColumn(out_col, extract_text(F.col(html_col)))


def make_trafilatura_udf(timeout_s: float = 1.0, **kwargs):
    """Library-backed extractor (reference parity path). Raises ImportError
    at *call* time on executors if trafilatura is unavailable."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def trafilatura_extract(htmls: pd.Series) -> pd.Series:
        import concurrent.futures as cf

        import trafilatura  # per-executor import (lazy singleton pattern)

        def one(h):
            if h is None:
                return None
            if isinstance(h, (bytes, bytearray)):
                h = h.decode("utf-8", errors="ignore")
            with cf.ThreadPoolExecutor(max_workers=1) as ex:
                fut = ex.submit(
                    trafilatura.extract,
                    h,
                    favor_precision=True,
                    include_comments=False,
                    deduplicate=True,
                    **kwargs,
                )
                try:
                    return fut.result(timeout=timeout_s)
                except cf.TimeoutError:
                    return None

        return htmls.map(one)

    return trafilatura_extract


def oracle_sql(table: str, html_expr: str, id_col: str = "doc_id") -> str:
    """DuckDB mirror of extract_text. DuckDB RE2 lacks backreferences, so the
    script/style block rule is expanded per tag."""
    s = f"CAST({html_expr} AS VARCHAR)"
    s = f"regexp_replace({s}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    s = f"regexp_replace({s}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    s = f"regexp_replace({s}, '(?s)<!--.*?-->', ' ', 'g')"
    s = f"regexp_replace({s}, '(?i)</(p|div|h[1-6]|li|tr|br)>|<br\\s*/?>', chr(10), 'g')"
    s = f"regexp_replace({s}, '(?s)<[^>]+>', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        s = f"replace({s}, '{ent}', '{rep_sql}')"
    s = f"regexp_replace({s}, '[ \\t\\x0b\\x0c\\r]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n ?', chr(10), 'g')"
    s = f"regexp_replace({s}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    s = f"regexp_replace(regexp_replace({s}, '^\\s+', ''), '\\s+$', '')"
    return f"SELECT {id_col}, {s} AS text FROM {table}"
