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


def md5_hash60(col: Column | str) -> Column:
    """60-bit integer hash from the md5 hex prefix — the cross-engine
    substitute for ``xxhash64`` wherever a DuckDB oracle must recompute
    the hash (DuckDB ships no xxhash64). 15 hex chars = 60 bits, well
    inside signed-BIGINT range in both engines, and md5 of a UTF-8
    string is byte-identical everywhere. Costs one md5 per value vs
    xxhash64's near-free mix, but stays JVM-codegen — for the hot path
    of an un-oracled production deployment, xxhash64 is a one-line
    drop-in. DuckDB twin: :func:`md5_hash60_sql`."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def md5_hash60_sql(expr: str) -> str:
    """DuckDB expression equivalent of :func:`md5_hash60`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_hash60_py(s: str) -> int:
    """Plain-Python twin of :func:`md5_hash60`, for Arrow-batched UDFs
    on the streaming ingest path and for plain-Python test references.
    One definition next to the Spark/DuckDB forms so a change to the
    hash width or encoding cannot silently drift one of the three
    copies (ADVICE r11: the 15-hex-char contract was re-implemented
    inline in two streaming UDFs and a test)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def word_count(col: Column | str) -> Column:
    """Whitespace-token count; 0 for blank strings."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))
