"""Vector math over ``array<float|double>`` columns — built-in
higher-order functions only (zip_with / aggregate), JVM-evaluated, so
similarity math runs inside whole-stage codegen, not Python.

All arithmetic is performed in double: float32 inputs are cast first
(exact widening), keeping results bit-comparable with the DuckDB oracle
which computes list_dot_product on DOUBLE[].
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return v.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
