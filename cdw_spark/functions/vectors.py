"""Vector math over array<float|double> columns — JVM-side higher-order
functions (zip_with + aggregate), no Python in the loop.

Cross-engine note: embeddings are stored float32; both engines cast to
double *before* any arithmetic so the accumulation (sequential left fold
here, sequential loop in DuckDB's list functions) produces identical IEEE
doubles — which makes cosine scores oracle-comparable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos = dot(a,b) / (||a|| * ||b||) — formula written explicitly so the
    oracle can reproduce the exact op order."""
    return dot(a, b) / (norm(a) * norm(b))
