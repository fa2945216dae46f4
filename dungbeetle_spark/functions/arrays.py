"""Array-expression helpers shared by the operators.

The one export, :func:`hof_let`, is the let-binding idiom for Spark
higher-order functions. HOF lambdas evaluate INTERPRETED per element,
and Catalyst's projection collapse substitutes column aliases into
lambda bodies — so a lambda that references an aliased tokenize/
normalize expression silently re-runs that whole-row computation once
per array element (O(len^2) per document for per-word windows; found
r11, see operators/mixing.word_ngrams for the measured case). When the
per-element access pattern fits ``zip_with`` over shifted slices, use
that; ``hof_let`` covers the shapes that genuinely need random access
into the array (chunked windows, index arithmetic).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def hof_let(arr: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``arr`` to a lambda variable and evaluate ``body`` on it.

    ``transform(array(arr), v -> body(v))[1]``: the outer ``array()``
    is an ordinary HOF *argument*, evaluated once per row, and the
    outer lambda's variable ``v`` is the already-materialized value —
    so any inner per-element lambda that closes over ``v`` touches a
    lambda variable (cheap) instead of re-evaluating ``arr``'s
    expression tree. Result and types are identical to inlining
    ``arr`` directly; only the evaluation count changes (measured 8x
    on the sf0.1 paragraph-window pass)."""
    return F.element_at(F.transform(F.array(arr), body), 1)
