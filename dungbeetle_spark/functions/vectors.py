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

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered-fold dot product of two equal-length float arrays.

    Higher-order-function form — works for any runtime length, but
    Spark evaluates HOF lambdas interpreted (outside codegen). Prefer
    :func:`dot_fixed` in hot paths when the dimension is known.
    """
    prod = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# -- fixed-dimension unrolled forms ----------------------------------------
# Element-wise getItem + left-associated adds build a plain (codegen-able)
# expression tree: 10-50× faster than the interpreted HOF fold above, and
# bit-identical to it — IEEE left-assoc sum p0+p1+... equals the fold
# ((0.0+p0)+p1)+... because 0.0+p0 == p0 exactly.


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    """Unrolled ordered dot product for a known dimension."""
    ca, cb = _c(a), _c(b)
    terms = [
        ca.getItem(i).cast("double") * cb.getItem(i).cast("double")
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def l2_norm_fixed(a: Column | str, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def cosine_similarity_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    return dot_fixed(a, b, dim) / (l2_norm_fixed(a, dim) * l2_norm_fixed(b, dim))


# -- Arrow-vectorized pair cosine ------------------------------------------
# For large pair sets (n² similarity joins) even a codegen'd expression
# tree is slow: 128 expression nodes per pair risks the 64KB generated-
# method limit (→ silent interpreted fallback), and expression aliases
# get re-inlined by CollapseProject. The Pandas UDF below does the same
# arithmetic vectorized across the batch while folding dimensions
# SEQUENTIALLY — `acc = acc + a_i*b_i` per dimension — so every pair's
# dot/norm is bit-identical to the JVM left-assoc fold and to a
# sequential C loop (DuckDB's list_cosine_similarity on DOUBLE[]).


def pair_cosine_udf(dim: int):
    """Returns a pandas_udf(double): exact cosine of two array<float> cols."""

    @F.pandas_udf("double")
    def pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        am = np.vstack(a.to_numpy()).astype(np.float64)  # float32→64 is exact
        bm = np.vstack(b.to_numpy()).astype(np.float64)
        dots = np.zeros(len(a))
        na = np.zeros(len(a))
        nb = np.zeros(len(a))
        for i in range(dim):  # sequential fold over dims, vectorized over rows
            ai, bi = am[:, i], bm[:, i]
            dots = dots + ai * bi
            na = na + ai * ai
            nb = nb + bi * bi
        return pd.Series(dots / (np.sqrt(na) * np.sqrt(nb)))

    return pair_cos
