"""Readability-style main-content extraction (the reference's second extractor).

Reference: ReadabilityInscriptis (src/datatrove/pipeline/extractors/
modular.py:35-51) — readability-lxml picks the main content block
(min_text_length / min_text_score gates), inscriptis renders it to text
with block-aware newlines, then excessive blank lines collapse to
``max_new_lines``. Users pick it over trafilatura when the latter
over-prunes.

Engine paths (mirroring operators/extract.py's two-tier design):

1. ``extract_readable`` — always-available native approximation, fully
   declarative (whole-stage codegen) with an exact DuckDB mirror:
     a. drop non-content machinery: <script>/<style>/<template>/comments;
     b. drop *boilerplate containers* — readability's "unlikely candidates"
        (readability cleans nav/footer/aside and class~=sidebar|comment
        nodes before scoring): structural tags <nav>/<header>/<footer>/
        <aside>/<form>, plus <div class|id~=(nav|menu|sidebar|footer|
        comment|banner|ad)> blocks. Regex matches the nearest closing tag
        (no nesting) — a documented approximation, identical in both
        engines since both use leftmost non-greedy semantics;
     c. block-aware tag strip + entity decode + whitespace normalization
        (inscriptis's strict-profile role), excess newlines collapsed to
        ``max_new_lines``;
     d. readability's emptiness gate: documents whose extracted text is
        shorter than ``min_text_length`` yield NULL (the reference's
        BaseExtractor drops empty extractions, base.py:58-66).
2. ``make_readability_udf`` — the library-backed parity path
   (readability-lxml + inscriptis, the reference's exact kwargs) in an
   Arrow-batched pandas UDF with a per-doc timeout; gated behind an
   import-try because neither wheel ships in this environment.

Scale: path 1 is a pure projection — no shuffle, scan-pruned, codegen'd;
path 2 is an Arrow-batched map, also shuffle-free.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf must resolve the 'pd.Series'
# string annotations (PEP 563) against module globals at decoration time
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.operators.extract import _ENTITIES

NAME = "readability"

# structural boilerplate containers readability removes before scoring
_DROP_TAGS = ("nav", "header", "footer", "aside", "form", "template")
_UNLIKELY = "nav|menu|sidebar|footer|comment|banner|ad"


def extract_readable(
    html_col: Column, max_new_lines: int = 2, min_text_length: int = 25
) -> Column:
    """Native main-content extraction from a BINARY (or STRING) html column."""
    s = html_col.cast("string")
    s = F.regexp_replace(s, r"(?is)<(script|style|template)[^>]*>.*?</\1>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    for tag in _DROP_TAGS:
        s = F.regexp_replace(s, rf"(?is)<{tag}[^>]*>.*?</{tag}>", " ")
    s = F.regexp_replace(
        s, rf'(?is)<div[^>]*(?:class|id)="[^"]*(?:{_UNLIKELY})[^"]*"[^>]*>.*?</div>', " "
    )
    s = F.regexp_replace(s, r"(?i)</(p|div|h[1-6]|li|tr|br)>|<br\s*/?>", "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[ \t\x0b\x0c\r]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{%d,}" % (max_new_lines + 1), "\n" * max_new_lines)
    s = F.regexp_replace(F.regexp_replace(s, r"^\s+", ""), r"\s+$", "")
    return F.when(F.length(s) >= min_text_length, s)


def apply(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "readability_text",
    max_new_lines: int = 2,
    min_text_length: int = 25,
) -> DataFrame:
    return df.withColumn(
        out_col, extract_readable(F.col(html_col), max_new_lines, min_text_length)
    )


def make_readability_udf(
    max_new_lines: int = 2,
    min_text_length: int = 25,
    min_text_score: int = 20,
    timeout_s: float = 0.1,
):
    """Library-backed parity path (modular.py:24-51 kwargs). Raises
    ImportError at call time on executors if the wheels are unavailable."""
    import re

    from pyspark.sql.types import StringType

    new_line_chars = "\n" * max_new_lines
    excessive = re.compile("(" + new_line_chars + "\n+)")

    @F.pandas_udf(StringType())
    def readability_extract(htmls: pd.Series) -> pd.Series:
        import concurrent.futures as cf

        from inscriptis import get_text  # per-executor import
        from inscriptis.css_profiles import CSS_PROFILES
        from inscriptis.model.config import ParserConfig
        from readability import Document as RDoc

        parser_config = ParserConfig(css=CSS_PROFILES["strict"])

        def one(h):
            if h is None:
                return None
            if isinstance(h, (bytes, bytearray)):
                h = h.decode("utf-8", errors="ignore")

            def work():
                doc = RDoc(
                    h, min_text_length=min_text_length, min_text_score=min_text_score
                )
                txt = get_text(doc.summary(html_partial=True), parser_config).strip()
                return excessive.sub(new_line_chars, txt)

            with cf.ThreadPoolExecutor(max_workers=1) as ex:
                fut = ex.submit(work)
                try:
                    return fut.result(timeout=timeout_s)
                except Exception:  # noqa: BLE001 — timeout or parse error drops the doc
                    return None

        return htmls.map(one)

    return readability_extract


def oracle_sql(
    table: str,
    html_expr: str,
    id_col: str = "doc_id",
    max_new_lines: int = 2,
    min_text_length: int = 25,
) -> str:
    """DuckDB mirror of extract_readable (RE2: backreference expanded per tag)."""
    s = f"CAST({html_expr} AS VARCHAR)"
    for tag in ("script", "style", "template"):
        s = f"regexp_replace({s}, '(?is)<{tag}[^>]*>.*?</{tag}>', ' ', 'g')"
    s = f"regexp_replace({s}, '(?s)<!--.*?-->', ' ', 'g')"
    for tag in _DROP_TAGS:
        s = f"regexp_replace({s}, '(?is)<{tag}[^>]*>.*?</{tag}>', ' ', 'g')"
    s = (
        f"regexp_replace({s}, '(?is)<div[^>]*(?:class|id)=\"[^\"]*(?:{_UNLIKELY})"
        f"[^\"]*\"[^>]*>.*?</div>', ' ', 'g')"
    )
    s = f"regexp_replace({s}, '(?i)</(p|div|h[1-6]|li|tr|br)>|<br\\s*/?>', chr(10), 'g')"
    s = f"regexp_replace({s}, '(?s)<[^>]+>', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        s = f"replace({s}, '{ent}', '{rep_sql}')"
    s = f"regexp_replace({s}, '[ \\t\\x0b\\x0c\\r]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n ?', chr(10), 'g')"
    nl = " || ".join(["chr(10)"] * max_new_lines)
    s = f"regexp_replace({s}, '\\n{{{max_new_lines + 1},}}', {nl}, 'g')"
    s = f"regexp_replace(regexp_replace({s}, '^\\s+', ''), '\\s+$', '')"
    return (
        f"SELECT {id_col}, CASE WHEN length({s}) >= {min_text_length} THEN {s} END "
        f"AS readability_text FROM {table}"
    )
