"""Value-level correctness: every oracle-backed query vs DuckDB.

This is a local mirror of the driver's t2 gate (sf0.01). Queries
without an oracle get a rows-and-schema sanity check instead.
"""

from __future__ import annotations

import pytest

from dungbeetle_spark.queries import registry
from tests.oracle import compare, duck_connect

SPECS = registry()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duck_connect(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_oracle, duck, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_oracle)
    compare(df, duck, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only(spark, sf_oracle, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_oracle)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None
