"""Vector math over array<float/double> columns — all JVM-side expressions.

Used by the embedding near-dup and ANN similarity operators. Dot products use
F.zip_with + F.aggregate which evaluate strictly left-to-right, giving
bit-reproducible float64 results (matched by an identical sequential fold in
the SQL oracle / numpy reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column) -> Column:
    # native Cast (whole-stage codegen), not F.transform(lambda) — the lambda
    # form plans an interpreted HOF projection per row for the same widening
    return c.cast("array<double>")


def shuffle_vec(df, vec_col: str) -> Column:
    """The SHUFFLE-side rendering of a vector column: float32 and float64
    inputs pass through untouched (a web-corpus embedding table stores
    float32 — widening it to array<double> before a pack/grid shuffle doubles
    the dominant payload for nothing, since the Arrow kernels re-widen to
    float64 themselves and float32→float64 is exact); any other numeric
    element type widens to double so downstream math is well-defined."""
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    dt = df.schema[vec_col].dataType
    if isinstance(dt, ArrayType) and isinstance(dt.elementType, (FloatType, DoubleType)):
        return F.col(vec_col)
    return to_double_array(F.col(vec_col))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
