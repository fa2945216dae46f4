"""Extended TPC-H-shaped relational coverage (Q8/9/11/12/15/16/17/20/21).

Completes the TPC-H query-shape surface the reference delegates to its
source databases (SURVEY.md §2 Part B): every remaining classic shape
— market-share ratio-of-sums, profit cube, scalar-threshold HAVING,
conditional-count pivot, argmax-equality join, distinct-count variety,
correlated-average decorrelation, qualifying-supplier semi-join, and
the unique-latest window cascade — adapted to the synthetic star
schema where it lacks TPC-H columns (no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode; adaptations noted per query).

Scale notes: dimensions broadcast explicitly, fact tables shuffle at
most once per aggregate key, scalar aggregates join back as 1-row
broadcasts, and every sum is decimal-exact (functions.numeric) so
results are partition-order-independent at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dungbeetle_spark.functions.numeric import dmul
from dungbeetle_spark.queries import _t, query


def _rev_col() -> F.Column:
    """Decimal-exact extended revenue, the cross-engine contract."""
    return dmul("l_extendedprice", F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))


@query(
    "q8_market_share",
    oracle="""
    WITH base AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey)
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_3's share of ASIA's PROMO-part volume "
    "per order year — ratio of two conditional decimal sums in ONE "
    "aggregate pass (no second scan for the denominator). The 6-way "
    "snowflake broadcasts every dim; the fact shuffles once on "
    "orderkey for the orders join, then once on the 1-column year key.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region",
           "part", "supplier")
    r = t["region"].filter(F.col("r_name") == "ASIA")
    p = t["part"].filter(F.col("p_type") == "PROMO")
    vol = _rev_col()
    base = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"].withColumnRenamed("n_name", "cust_nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(
                t["nation"]
                .select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(zero))
            .cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (adapted: no partsupp table, so profit is "
    "discounted revenue without the supplycost term): profit on "
    "'gear' parts per supplier nation per year. The part filter "
    "broadcasts and prunes the fact FIRST (the most selective join), "
    "then supplier/nation broadcast; one orderkey shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    p = t["part"].filter(F.col("p_name").like("%gear%")).select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_rev_col()).cast("double").alias("profit"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS v
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) FROM pv) * 0.00075
    """,
    doc="TPC-H Q11 shape (adapted: part value from lineitem revenue — "
    "no partsupp): parts whose traded value exceeds 0.075% of the "
    "global total. The global scalar comes from RE-AGGREGATING the "
    "2000-row per-part aggregate (kilobytes), never a second fact "
    "scan, and joins back as a 1-row broadcast nested loop.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    pv = l.groupBy("l_partkey").agg(F.sum(_rev_col()).alias("v"))
    total = pv.agg(F.sum("v").cast("double").alias("total"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("total") * 0.00075)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
    )


@query(
    "q12_shipping_delay",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(SUM(CASE WHEN l.l_shipdate <  o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (adapted: no l_shipmode/commitdate — the "
    "late/ontime split is shipdate ≥ orderdate + 90 days, grouped by "
    "order priority): dual conditional counts in one aggregate pass "
    "over the single orderkey-shuffled join.",
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders")
    late = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r AS DOUBLE) AS total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE r = (SELECT MAX(r) FROM rev)
    """,
    doc="TPC-H Q15 shape: the supplier(s) with maximum half-year "
    "revenue. The revenue 'view' computes once; its 100-row result "
    "re-aggregates for the scalar max (broadcast back — never a "
    "re-scan) and the argmax equality compares EXACT decimals, so "
    "ties and the winner are partition-order-independent.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_col()).alias("r"))
    )
    top = rev.agg(F.max("r").alias("r_max"))
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("r") == F.col("r_max"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_revenue"))
    )


@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1,5,9,13,17,21,25,29)
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q16 shape (adapted: the part↔supplier relation comes "
    "from lineitem — no partsupp): distinct supplier count per "
    "(brand, type, size) outside Brand#1. The part filter broadcasts "
    "and prunes the fact scan-side; COUNT(DISTINCT) expands exactly "
    "one shuffle key.",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
    doc="TPC-H Q17 shape: revenue lost to small-quantity orders. The "
    "correlated per-part average decorrelates into a 2000-row "
    "aggregate broadcast back onto the fact — the scan reads lineitem "
    "twice (narrow projections) but never shuffles it; the average is "
    "an exact-decimal sum over one double division, replicated "
    "bit-for-bit by the oracle.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")["lineitem"]
    pa = (
        l.groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("l_quantity")
            ).alias("avg_qty")
        )
    )
    return (
        l.join(F.broadcast(pa), F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@query(
    "q20_qualified_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red %'
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM sp
    JOIN supplier s ON s.s_suppkey = sp.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE sp.qty > 250
    """,
    doc="TPC-H Q20 shape (adapted: qualification by shipped quantity "
    "from lineitem — no partsupp availqty): suppliers who moved > 250 "
    "units of red parts in 1997. The inner aggregate reduces the fact "
    "to 100 supplier rows BEFORE touching the supplier/nation dims — "
    "a semi-join via aggregate, the decorrelated form of Q20's "
    "nested EXISTS.",
)
def q20_qualified_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    p = t["part"].filter(F.col("p_name").like("red %")).select("p_partkey")
    sp = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > 250)
    )
    return (
        sp.join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "q21_latest_shippers",
    oracle="""
    WITH os AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
      FROM lineitem GROUP BY 1, 2),
    w1 AS (
      SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supps,
             MAX(supp_last) OVER (PARTITION BY l_orderkey) AS order_last
      FROM os),
    w2 AS (
      SELECT *, SUM(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                  OVER (PARTITION BY l_orderkey) AS n_at_last
      FROM w1)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM w2 JOIN supplier s ON s.s_suppkey = w2.l_suppkey
    WHERE n_supps >= 2 AND n_at_last = 1 AND supp_last = order_last
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
    doc="TPC-H Q21 shape (adapted: no l_receiptdate/commitdate — "
    "'kept the order waiting' = sole latest shipper among ≥2 "
    "suppliers on the order): Q21's EXISTS / NOT-EXISTS pair "
    "decorrelates into two window passes over ONE orderkey "
    "partitioning (a single shuffle serves both), then a broadcast "
    "supplier join and a top-20 with explicit tiebreak.",
)
def q21_latest_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier")
    # One explicit hash partitioning on l_orderkey serves BOTH the
    # (l_orderkey, l_suppkey) aggregate (HashPartitioning on a subset
    # of the grouping keys satisfies its ClusteredDistribution) and
    # the l_orderkey windows — 2 total exchanges instead of 3, and the
    # fact rows shuffle once, not twice (measured 1.27s → 0.52s at
    # sf0.1; the win compounds at scale where the fact shuffle IS the
    # query cost).
    os_ = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    w = W.partitionBy("l_orderkey")
    w2 = (
        os_.withColumn("n_supps", F.count(F.lit(1)).over(w))
        .withColumn("order_last", F.max("supp_last").over(w))
        .withColumn(
            "n_at_last",
            F.sum(
                F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)
            ).over(w),
        )
    )
    return (
        w2.filter(
            (F.col("n_supps") >= 2)
            & (F.col("n_at_last") == 1)
            & (F.col("supp_last") == F.col("order_last"))
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "grouping_sets_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Arbitrary GROUPING SETS (beyond the rollup/cube shorthands "
    "covered elsewhere) with GROUPING() markers disambiguating "
    "subtotal NULLs from data NULLs. Catalyst expands all three sets "
    "in ONE Expand + aggregate pass over a single scan — no per-set "
    "re-scan. Expressed through spark.sql to exercise the task-SQL "
    "passthrough path the job server serves.",
)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem")
    t["lineitem"].createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "customer_status_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="Multiset EXCEPT ALL (bag semantics — each F-status order "
    "cancels ONE O-status occurrence of the same customer, unlike the "
    "set-based operators in customer_set_ops). Catalyst plans a "
    "single hash aggregation counting occurrences per side, then "
    "replicates rows by the count difference — one shuffle, no "
    "row-by-row anti join.",
)
def customer_status_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    open_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    filled_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_keys.exceptAll(filled_keys)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery + UNPIVOT — SQL-surface completions
# ---------------------------------------------------------------------------


@query(
    "lateral_topk_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           l.o_orderkey AS top_orderkey,
           l.o_totalprice AS top_order_price
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 1) l
    """,
    doc="LATERAL correlated subquery: each customer's single most "
    "expensive order, written as a per-row dependent subquery — the "
    "SQL-standard form of a top-1-per-group. Catalyst DECORRELATES "
    "the lateral into a ranked window over one orders shuffle (no "
    "per-customer re-execution, which is how a naive engine runs "
    "LATERAL); customers with no orders drop (inner lateral). "
    "Deterministic tiebreak on o_orderkey; o_totalprice passes "
    "through untransformed so the double is bit-identical.",
)
def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run through ``spark.sql`` on purpose: LATERAL is a task-SQL
    surface feature (the job server executes user SQL verbatim), and
    the point is that Spark's decorrelation turns the row-dependent
    subquery into the same window-rank plan top_events_per_user gets
    from the DataFrame API — one shuffle, WindowGroupLimit prune."""
    t = _t(spark, sf_dir, "customer", "orders")
    t["customer"].createOrReplaceTempView("_lat_customer")
    t["orders"].createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               l.o_orderkey AS top_orderkey,
               l.o_totalprice AS top_order_price
        FROM _lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM _lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 1) l
        """
    )


@query(
    "unpivot_user_metrics",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             CAST(MIN(value) AS DOUBLE) AS min_value,
             CAST(MAX(value) AS DOUBLE) AS max_value
      FROM events GROUP BY user_id)
    SELECT user_id, 'n_events' AS metric, n_events AS value FROM wide
    UNION ALL
    SELECT user_id, 'total_value', total_value FROM wide
    UNION ALL
    SELECT user_id, 'min_value', min_value FROM wide
    UNION ALL
    SELECT user_id, 'max_value', max_value FROM wide
    """,
    doc="UNPIVOT (wide → long, the inverse of pivot_event_counts): "
    "per-user metric columns melt into (user_id, metric, value) rows "
    "via DataFrame.unpivot — Catalyst plans one Expand over the "
    "aggregate, not four re-scans (the UNION ALL the oracle spells "
    "out). Sum goes through decimal before the double cast "
    "(fold-order-free, the dsum contract).",
)
def unpivot_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dungbeetle_spark.functions.numeric import dsum

    e = _t(spark, sf_dir, "events")["events"]
    wide = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        dsum("value").alias("total_value"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_events", "total_value", "min_value", "max_value"],
        variableColumnName="metric",
        valueColumnName="value",
    )
