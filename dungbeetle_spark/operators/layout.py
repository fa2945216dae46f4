"""Physical-layout operators: Z-order clustering audit + join-skew profiling.

At 100 TB the dominant cost is not the operator graph but what the scan
can *skip* and how evenly the shuffle lands. These operators are the
engine's layout toolchain:

- ``zorder_layout_stats`` computes a Morton (Z-order) interleave key
  over two query dimensions and audits the resulting zone maps — the
  min/max-per-file statistics a scan uses for multi-dimensional data
  skipping (the analysis behind ``OPTIMIZE ZORDER BY`` in lakehouse
  table formats).
- ``join_skew_profile`` measures the key-frequency distribution of the
  fact table's join keys in log2 buckets — the pre-flight audit that
  decides broadcast vs shuffle vs salted join before a big run.

The reference (a delegating SQL job server, internal/core/core.go)
has no layout layer at all; these exist because a Spark-native engine
owns its storage layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dungbeetle_spark.queries import _t, query

# Morton bit-spread: 16-bit value -> 32-bit with zeros interleaved.
# Classic magic-number spread (public-domain bit-twiddling identity):
# each step doubles the gap between populated bit groups.
_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_col(c: Column) -> Column:
    """Spark-side 16-bit Morton spread (pure JVM bitwise codegen)."""
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def _spread_sql(expr: str) -> str:
    """The identical spread as a DuckDB SQL expression string."""
    for shift, mask in _SPREAD_STEPS:
        expr = f"(({expr} | ({expr} << {shift})) & {mask})"
    return expr


# Oracle twin of the Spark plan below. The zone id takes the top bits
# of the interleaved key, so one zone covers a small square-ish region
# of (custkey, day) space — that locality is the whole point of
# Z-ordering.
_X_SQL = "(o_custkey & 65535)"
_Y_SQL = "((CAST(o_orderdate AS DATE) - DATE '1995-01-01') & 65535)"
_ZKEY_SQL = f"({_spread_sql(_X_SQL)} | ({_spread_sql(_Y_SQL)} << 1))"


@query(
    "zorder_layout_stats",
    oracle=f"""
    WITH keyed AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS day_idx,
             {_ZKEY_SQL} >> 14 AS zone_id
      FROM orders)
    SELECT zone_id,
           CAST(COUNT(*) AS BIGINT) AS rows,
           MIN(o_custkey) AS min_custkey, MAX(o_custkey) AS max_custkey,
           MIN(day_idx) AS min_day, MAX(day_idx) AS max_day
    FROM keyed GROUP BY zone_id
    """,
    doc="Z-order layout audit: Morton-interleave (o_custkey, order-day) "
    "into a 32-bit Z key, group rows into zones by Z-prefix, and emit "
    "each zone's zone map (min/max of BOTH dimensions + row count). "
    "Tight per-zone ranges on both axes are what let a scan skip "
    "files for predicates on either column — the multi-dimensional "
    "data-skipping property linear sort orders cannot give. Pure "
    "bitwise JVM codegen (shiftleft/and/or), one aggregate shuffle.",
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the Z key is a per-row bitwise expression (no
    shuffle); the zone-map aggregate partial-aggregates map-side down
    to |zones| rows, which depends on the key-space spread, not the
    row count. Writing the actual layout at 100 TB is
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` — the
    range sampler picks balanced file cuts; this operator is the audit
    that proves those cuts give skippable zone maps."""
    o = _t(spark, sf_dir, "orders")["orders"]
    x = F.col("o_custkey").bitwiseAND(F.lit(65535))
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    # datediff is IntegerType: spread in int64 or shiftleft(...,1)
    # wraps negative once bit 15 of the masked day is set (any
    # pre-anchor or >= anchor+2^15-day date) — the oracle is BIGINT
    y = day.cast("long").bitwiseAND(F.lit(65535))
    zkey = _spread_col(x).bitwiseOR(F.shiftleft(_spread_col(y), 1))
    return (
        o.select(
            "o_custkey",
            day.alias("day_idx"),
            F.shiftright(zkey, 14).alias("zone_id"),
        )
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("o_custkey").alias("min_custkey"),
            F.max("o_custkey").alias("max_custkey"),
            F.min("day_idx").alias("min_day"),
            F.max("day_idx").alias("max_day"),
        )
    )


_SKEW_KEYS = ["l_orderkey", "l_partkey", "l_suppkey"]


@query(
    "join_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT key_column, cnt FROM (
        SELECT 'l_orderkey' AS key_column, COUNT(*) AS cnt
          FROM lineitem GROUP BY l_orderkey
        UNION ALL
        SELECT 'l_partkey', COUNT(*) FROM lineitem GROUP BY l_partkey
        UNION ALL
        SELECT 'l_suppkey', COUNT(*) FROM lineitem GROUP BY l_suppkey)),
    bucketed AS (
      SELECT key_column,
             CAST(LENGTH(BIN(cnt)) - 1 AS INT) AS log2_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows
      FROM per_key GROUP BY 1, 2)
    SELECT key_column, log2_bucket, n_keys, n_rows,
           CAST(n_rows * 1000000 // SUM(n_rows) OVER (PARTITION BY key_column)
                AS BIGINT) AS rows_share_ppm
    FROM bucketed
    """,
    doc="Join-skew pre-flight: per candidate join key of the fact "
    "table, the distribution of per-key row counts in log2 buckets "
    "(bucket = floor(log2(count)) via LENGTH(BIN(n))-1 — exact "
    "integer math, no float log), with each bucket's row share in "
    "ppm (integer floor division). A heavy top bucket on one key "
    "says: salt or AQE-skew-split that join; a flat profile says a "
    "plain shuffle join lands evenly. This is the measurement that "
    "should precede strategy choice on any 100 TB join.",
)
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one single-column aggregate pass per key (parquet
    reads ONE column each; map-side partial combine), then a second
    aggregate over |distinct keys| rows down to <=64 buckets per key.
    The ppm window runs over that tiny bucketed frame, never the fact
    table. ppm numerator n_rows*1e6 stays in int64 up to ~9e12 rows
    per bucket; beyond that widen to DECIMAL(38,0)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    profiles = []
    for key in _SKEW_KEYS:
        per_key = (
            li.select(key)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.lit(key).alias("key_column"),
                (F.length(F.bin("cnt")) - 1).cast("int").alias("log2_bucket"),
                F.col("cnt"),
            )
        )
        profiles.append(
            per_key.groupBy("key_column", "log2_bucket").agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("cnt").alias("n_rows"),
            )
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out.select(
        "key_column",
        "log2_bucket",
        "n_keys",
        "n_rows",
        F.expr("CAST(n_rows * 1000000 DIV SUM(n_rows) OVER (PARTITION BY key_column) AS BIGINT)").alias(
            "rows_share_ppm"
        ),
    )


@query(
    "join_cardinality_forecast",
    oracle="""
    SELECT 'lineitem_x_orders' AS join_name,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS shared_keys,
           CAST(COUNT(*) AS BIGINT) AS predicted_rows
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'lineitem_x_part',
           CAST(COUNT(DISTINCT p_partkey) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    doc="Join-cardinality forecast: |A JOIN B on k| equals "
    "sum over shared keys of count_A(k) * count_B(k), so the exact "
    "output size of a fact-fact join is computable from two per-key "
    "count tables whose size is |distinct keys|, never materializing "
    "the join. The oracle executes the REAL joins and counts -- the "
    "two derivations must agree exactly, which is a stronger check "
    "than re-running the same formula. This is the pre-flight that "
    "decides whether a 100 TB join's output fits the next stage "
    "before burning the shuffle.",
)
def join_cardinality_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: each side reduces to per-key counts with map-side
    partial aggregation (single-column scans), and the forecast join
    runs on |distinct keys| rows -- for lineitem x orders that is
    |orders| instead of |lineitem x orders| ~ 4x larger; for skewed
    keys the savings is quadratic in the hot-key count. The sum of
    products stays in int64 up to ~9e18 predicted rows."""
    t = _t(spark, sf_dir, "lineitem", "orders", "part")

    def counts(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(F.col(key).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def forecast(a: DataFrame, b: DataFrame, name: str) -> DataFrame:
        return (
            a.join(b.withColumnRenamed("n", "m"), "k")
            .agg(
                F.count(F.lit(1)).alias("shared_keys"),
                F.sum(F.col("n") * F.col("m")).alias("predicted_rows"),
            )
            .select(
                F.lit(name).alias("join_name"), "shared_keys", "predicted_rows"
            )
        )

    li_ok = counts(t["lineitem"], "l_orderkey")
    o_ok = counts(t["orders"], "o_orderkey")
    li_pk = counts(t["lineitem"], "l_partkey")
    p_pk = counts(t["part"], "p_partkey")
    return forecast(li_ok, o_ok, "lineitem_x_orders").unionByName(
        forecast(li_pk, p_pk, "lineitem_x_part")
    )
