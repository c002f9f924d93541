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


def quantize_int8(vec: Column) -> Column:
    """Scalar int8-range quantization of a vector: struct(vmin, scale,
    q: array<int> in [0,255]). Cuts embedding storage 4× (float32→byte
    semantics; parquet dictionary/RLE shrinks it further) — the storage
    path for 100 TB of embeddings; search dequantizes on the fly.

    Rounding is floor(x + 0.5) — identical in every engine, unlike
    round() whose half-way tie rule differs.
    """
    vmin = F.array_min(vec)
    scale = (F.array_max(vec) - vmin) / F.lit(255.0)
    q = F.transform(
        vec,
        lambda x: F.when(F.lit(True) & (scale == 0), F.lit(0)).otherwise(
            F.floor((x - vmin) / scale + F.lit(0.5)).cast("int")
        ),
    )
    return F.struct(
        vmin.alias("vmin"), scale.alias("scale"), q.alias("q")
    )


def dequantize_int8(qs: Column) -> Column:
    """Inverse of quantize_int8: x' = q*scale + vmin (array<double>)."""
    return F.transform(
        qs["q"], lambda b: b.cast("double") * qs["scale"] + qs["vmin"]
    )
