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
