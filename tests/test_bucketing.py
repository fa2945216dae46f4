"""Bucketed co-located joins skip their shuffles entirely."""

from __future__ import annotations

import pytest

from dungbeetle_spark.plans.inspect import formatted_plan, shuffle_exchanges
from dungbeetle_spark.sources.bucketing import bucketed, bucketize
from dungbeetle_spark.sources.catalog import load_tables


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_smoke):
    t = load_tables(spark, sf_smoke, ["orders", "lineitem"])
    bucketize(t["orders"], "b_orders", "o_orderkey", 8)
    bucketize(t["lineitem"], "b_lineitem", "l_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    ot, lt = bucketed_pair
    o, l = bucketed(spark, ot), bucketed(spark, lt)
    joined = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_orderdate"
    )
    assert shuffle_exchanges(joined) == 0, formatted_plan(joined)
    assert joined.count() > 0


def test_bucketed_aggregate_has_no_shuffle(spark, bucketed_pair):
    _, lt = bucketed_pair
    from pyspark.sql import functions as F

    l = bucketed(spark, lt)
    agg = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert shuffle_exchanges(agg) == 0, formatted_plan(agg)


def test_unbucketed_join_does_shuffle(spark, sf_smoke):
    """Control: the same join on raw tables pays exchanges, proving
    the bucketed plan's zero-shuffle is the bucketing, not AQE."""
    t = load_tables(spark, sf_smoke, ["orders", "lineitem"])
    joined = t["lineitem"].join(
        t["orders"].hint("merge"), t["lineitem"].l_orderkey == t["orders"].o_orderkey
    )
    assert shuffle_exchanges(joined) >= 2
