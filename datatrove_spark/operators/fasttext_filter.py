"""fastText classifier filter — model-backed scoring behind an import gate.

Reference: FastTextClassifierFilter (src/datatrove/pipeline/filters/
fasttext_filter.py:13,85-112): a generic fastText model scores each doc
(or unit), keep/remove label thresholds decide, mean label scores land in
metadata. LanguageFilter (language_filter.py:49-62) is the lid.176.bin
special case.

The fasttext wheel is not installed in this environment, so:

- ``make_fasttext_udf`` builds the real path: Arrow-batched pandas UDF
  with the reference's per-executor lazy model singleton
  (language_filter.py:35-47 pattern) — model file distributed via
  ``SparkContext.addFile`` and resolved with SparkFiles.get on executors;
- ``apply`` falls back to the deterministic stopword-profile scorer
  (operators/langid.py) when fasttext is unavailable, keeping the output
  schema identical so pipelines are portable across environments.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves PEP 563 string annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from datatrove_spark.config import LangIdConfig
from datatrove_spark.operators import langid

NAME = "fasttext_filter"

_RESULT = StructType(
    [StructField("label", StringType()), StructField("score", DoubleType())]
)

_MODEL_SINGLETON: dict[str, object] = {}


def _load_model(model_file: str):
    """Per-executor-process lazy singleton (one model per Python worker)."""
    if model_file not in _MODEL_SINGLETON:
        import fasttext  # gated import — raises if unavailable
        from pyspark import SparkFiles

        path = model_file if os.path.exists(model_file) else SparkFiles.get(os.path.basename(model_file))
        _MODEL_SINGLETON[model_file] = fasttext.load_model(path)
    return _MODEL_SINGLETON[model_file]


def make_fasttext_udf(model_file: str):
    @F.pandas_udf(_RESULT)
    def classify(texts: pd.Series) -> pd.DataFrame:
        model = _load_model(model_file)
        labels, scores = [], []
        # batch predict: fastText's list API is its encode_batch analog
        cleaned = [(t or "").replace("\n", " ") for t in texts]
        pred_labels, pred_scores = model.predict(cleaned)
        for ls, ss in zip(pred_labels, pred_scores):
            labels.append(ls[0].removeprefix("__label__") if ls else None)
            scores.append(float(ss[0]) if len(ss) else 0.0)
        return pd.DataFrame({"label": labels, "score": scores})

    return classify


def fasttext_available() -> bool:
    try:
        import fasttext  # noqa: F401

        return True
    except ImportError:
        return False


def apply(
    df: DataFrame,
    spark: SparkSession | None = None,
    model_file: str | None = None,
    text_col: str = "text",
    keep_labels: tuple[str, ...] = ("en",),
    threshold: float = 0.65,
) -> DataFrame:
    """Model-backed when fasttext + model_file are available; otherwise the
    deterministic heuristic scorer with the same output columns."""
    if model_file and fasttext_available():
        if spark is not None:
            spark.sparkContext.addFile(model_file)
        res = make_fasttext_udf(model_file)(F.col(text_col))
        df = df.withColumn("language", res["label"]).withColumn("language_score", res["score"])
        keep = F.col("language").isin(*keep_labels) & (F.col("language_score") > threshold)
        return df.withColumn(
            f"{NAME}_reason",
            F.when(~keep, F.lit("lang_filter")).otherwise(F.lit(None).cast("string")),
        ).withColumn(f"{NAME}_keep", keep)
    out = langid.apply(df, text_col, LangIdConfig(languages=keep_labels))
    return (
        out.withColumnRenamed("langid_reason", f"{NAME}_reason")
        .withColumnRenamed("langid_keep", f"{NAME}_keep")
    )
