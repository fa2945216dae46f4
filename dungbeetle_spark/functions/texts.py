"""Text column expressions shared by the text-analysis and dedup
operators. All JVM-side (``pyspark.sql.functions``) — no Python in the
hot path, so these run inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def norm_text(col: Column | str) -> Column:
    """Canonical text normalization for dedup: lowercase, collapse
    whitespace, trim. Mirror in DuckDB:
    ``trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))``."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def content_md5(col: Column | str) -> Column:
    """Stable cross-engine content fingerprint (md5 of normalized
    text). ``md5`` produces identical hex in Spark and DuckDB."""
    return F.md5(norm_text(col))


def content_md5_sql(expr: str = "text") -> str:
    """DuckDB expression equivalent of :func:`content_md5` — the single
    source of truth for oracle SQL that fingerprints content (used by
    the dedup_exact and corpus_clean oracles)."""
    return f"md5(trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g')))"


def word_count(col: Column | str) -> Column:
    """Whitespace-token count; 0 for blank strings."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
