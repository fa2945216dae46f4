"""Vector column expressions — JVM-side, no Python UDFs.

Embedding math (dot products, norms, cosine) stays inside whole-stage
codegen via ``F.zip_with`` + ``F.aggregate`` over ``array<float>``
columns. Elements are cast to double *before* reduction and folded
left-to-right in array order, so the result is deterministic and
matches any engine that folds the same way. NB: DuckDB's
``list_cosine_similarity`` computes in float32 when given ``FLOAT[]``
inputs — oracles must ``CAST(... AS DOUBLE[])`` to match this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered-fold dot product of two equal-length float arrays."""
    prod = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
