"""Vector column expressions over ``array<float>`` embeddings.

Built entirely from Spark higher-order functions (zip_with / transform
/ aggregate) so the arithmetic stays JVM-side and codegen'd — no UDF,
no Python round-trip. Elements are cast to double before any multiply
so results are bit-comparable with a double-precision oracle: both
Spark's ``aggregate`` and an ordered SQL fold sum elements left-to-right
in array order, giving identical IEEE-754 results.

These are the kernels for the similarity-search and embedding-dedup
operators (extensions beyond the reference surface; the reference has
no vector types — SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
