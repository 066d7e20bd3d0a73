"""C4/mC4 paragraph filter — fully native Spark column expressions.

Reference: C4ParagraphFilter (src/datatrove/pipeline/filters/c4_filters.py:
138-168): keep a page iff it has >= 3 lines AND the 3rd-longest line is
>= 200 chars (`min(heapq.nlargest(3, line_lengths)) >= 200`, :155-160);
drop reason is the literal string "< 3 paragraphs" (:166).

Spark shape (SURVEY §2.4): split -> transform(length) -> sort desc ->
element_at(3) — one narrow projection, whole-stage codegen, no Python,
no shuffle. The top-3 selection is O(n log n) on the line array vs the
reference's heap O(n); line counts per page are tiny, irrelevant at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datatrove_spark.config import C4ParagraphConfig

NAME = "c4_paragraphs"


def reason_column(text_col: Column, cfg: C4ParagraphConfig = C4ParagraphConfig()) -> Column:
    lens = F.transform(F.split(text_col, "\n", -1), F.length)
    ok = (F.size(lens) >= cfg.min_paragraphs) & (
        F.get(F.sort_array(lens, asc=False), cfg.min_paragraphs - 1) >= cfg.min_paragraph_len
    )
    return F.when(~ok, F.lit(f"< {cfg.min_paragraphs} paragraphs"))


def apply(
    df: DataFrame, text_col: str = "text", cfg: C4ParagraphConfig = C4ParagraphConfig()
) -> DataFrame:
    reason = reason_column(F.col(text_col), cfg)
    return df.withColumn(f"{NAME}_reason", reason).withColumn(
        f"{NAME}_keep", F.col(f"{NAME}_reason").isNull()
    )


def oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: C4ParagraphConfig = C4ParagraphConfig(),
) -> str:
    return f"""
WITH lens AS (
  SELECT {id_col} AS id,
    list_transform(string_split({text_col}, chr(10)), l -> len(l)) AS ls
  FROM {table}
), ok AS (
  SELECT id, len(ls) >= {cfg.min_paragraphs}
    AND list_reverse_sort(ls)[{cfg.min_paragraphs}] >= {cfg.min_paragraph_len} AS keep
  FROM lens
)
SELECT id AS {id_col},
  CASE WHEN NOT keep THEN '< {cfg.min_paragraphs} paragraphs' END AS {NAME}_reason,
  keep AS {NAME}_keep
FROM ok
""".strip()
