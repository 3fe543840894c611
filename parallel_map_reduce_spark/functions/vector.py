"""Vector math over ARRAY<FLOAT/DOUBLE> columns — pure Column expressions.

``F.zip_with`` + ``F.aggregate`` run JVM-side inside codegen: no Python,
no UDF serialization. For 64-dim embeddings this is a tight per-row loop;
the same expressions vectorize fine at 100 TB because they're per-row
compute with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product (matches DuckDB list_dot_product)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
