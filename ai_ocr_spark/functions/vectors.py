"""Vector expression builders for embedding columns (array<float>).

Cosine/dot are computed as strict left folds over doubles so the result
is bit-identical to the DuckDB oracle's list_reduce fold: identical
float32 inputs widened to float64, multiplied and summed in index order.
No rounding is needed downstream — exact doubles hash equal.

JVM-side only (F.aggregate / F.zip_with), no UDF: at 100 TB the ANN
pre-filter must run inside codegen next to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product: 0.0 + a1*b1 + a2*b2 + ... in index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a, b) with both inputs already array<double>."""
    return dot(a, b) / (norm(a) * norm(b))
