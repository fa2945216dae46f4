"""Deterministic numeric aggregation helpers.

Floating-point SUM over a shuffled dataset is order-dependent — at
1000 executors the same query can return different low-order bits on
every run, which breaks both the DuckDB value-hash oracle and any
cache-consistency story. The engine's contract (matching the
reference's DECIMAL canonical type, sqldb.go:259-260): monetary /
measure columns aggregate in exact decimal arithmetic and only convert
to double at the end. Decimal addition is associative+commutative, so
the result is independent of partitioning and AQE decisions at any
cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact, order-independent SUM of a fixed-point-valued double.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum, one double division.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def dmul(a: Column | str, b: Column | str, scale: int = 2) -> Column:
    """Exact decimal product of two fixed-point-valued doubles."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return ca.cast(f"decimal(18,{scale})") * cb.cast(f"decimal(18,{scale})")
