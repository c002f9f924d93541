"""Vector math over ``array<float/double>`` columns — Catalyst-native.

For the similarity-search surface (SURVEY.md §2.h). Built on
``zip_with``/``aggregate`` higher-order functions: JVM-side, no Python,
no UDF — at 100 TB these run inside whole-stage codegen and the only
cost is the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))
