"""Local mirror of the driver's DuckDB-oracle comparison.

Compares a Spark DataFrame against DuckDB running the oracle SQL on
the same parquet tables: row count, column names, and order-
insensitive values. Run by test_queries_oracle.py for every registered
query that carries an oracle.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from dungbeetle_spark.sources.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> int:
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(oracle)
    d_cols = [c.lower() for c in rel.columns]
    # The driver's hasher canonicalizes HUGEINT (int128) through a
    # different path than BIGINT and hash-mismatches even on equal
    # values (the r08 shard_plan/bpe_compression class). Any oracle
    # emitting HUGEINT must CAST(... AS BIGINT) explicitly.
    hugeint = [c for c, t in zip(rel.columns, rel.types) if str(t) == "HUGEINT"]
    assert not hugeint, (
        f"oracle emits HUGEINT columns {hugeint}; wrap in CAST(... AS BIGINT) "
        "— the driver's hasher canonicalizes int128 differently than int64"
    )
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: {len(s_rows)} vs {len(d_rows)}"
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, (
        f"{len(mismatches)}/{len(sn)} rows differ; first: "
        f"spark={mismatches[0][0]} duckdb={mismatches[0][1]}"
    )
    return len(s_rows)
