"""The §1.3 type-collapse table as unit tests (SURVEY.md).

Reference behavior: every result column collapses to BIGINT / DECIMAL /
TIMESTAMP / DATE / BOOLEAN / TEXT (+ array passthrough), nullability
preserved (internal/resultbackends/sqldb/sqldb.go:254-285).
"""

from __future__ import annotations

import datetime
import json
from decimal import Decimal

from pyspark.sql import types as T

from dungbeetle_spark.results import canonical_cast, canonical_type


def test_integers_collapse_to_long():
    for dt in (T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()):
        assert canonical_type(dt) == T.LongType()


def test_floats_collapse_to_decimal():
    assert canonical_type(T.FloatType()) == T.DecimalType(38, 18)
    assert canonical_type(T.DoubleType()) == T.DecimalType(38, 18)
    # existing decimals keep their precision (NUMERIC passthrough)
    assert canonical_type(T.DecimalType(12, 4)) == T.DecimalType(12, 4)


def test_temporal_and_boolean_preserved():
    assert canonical_type(T.TimestampType()) == T.TimestampType()
    assert canonical_type(T.TimestampNTZType()) == T.TimestampNTZType()
    assert canonical_type(T.DateType()) == T.DateType()
    assert canonical_type(T.BooleanType()) == T.BooleanType()


def test_arrays_collapse_elementwise():
    assert canonical_type(T.ArrayType(T.IntegerType())) == T.ArrayType(T.LongType())
    assert canonical_type(T.ArrayType(T.StringType())) == T.ArrayType(T.StringType())


def test_everything_else_is_text():
    assert canonical_type(T.StringType()) == T.StringType()
    assert canonical_type(T.BinaryType()) == T.StringType()
    assert canonical_type(T.MapType(T.StringType(), T.LongType())) == T.StringType()


def test_canonical_cast_end_to_end(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                2.5,
                True,
                datetime.date(2024, 1, 2),
                [1, 2],
                {"k": 7},
                ("a", 3),
            )
        ],
        "i int, x double, b boolean, d date, arr array<int>, m map<string,int>, s struct<f1:string,f2:int>",
    )
    out = canonical_cast(df)
    got = {f.name: f.dataType for f in out.schema.fields}
    assert got["i"] == T.LongType()
    assert got["x"] == T.DecimalType(38, 18)
    assert got["b"] == T.BooleanType()
    assert got["d"] == T.DateType()
    assert got["arr"] == T.ArrayType(T.LongType())
    assert got["m"] == T.StringType()  # JSON text
    assert got["s"] == T.StringType()  # JSON text
    row = out.collect()[0]
    assert row["i"] == 1 and row["x"] == Decimal("2.5")
    assert json.loads(row["m"]) == {"k": 7}
    assert json.loads(row["s"]) == {"f1": "a", "f2": 3}
