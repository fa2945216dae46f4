"""Modern SQL-surface coverage: the Spark 4 additions to the delegated
task-SQL dialect (SURVEY.md §2 Part B).

The reference executes user SQL verbatim against its source databases
(zerodha/dungbeetle sql/pg/test.postgres.sql is the whole shipped
surface), so the dialect a user can write is bounded by the engine
underneath. These queries pin the Spark-4-era constructs that engine
gains: LISTAGG WITHIN GROUP, ordered-set aggregates
(mode / percentile_disc), recursive CTEs, the VARIANT semi-structured
type, and collation-aware grouping — plus the gaps-and-islands streak
idiom those warehouses run daily.

Scale notes: every query here aggregates on a bounded key (nation,
event_type, user_id, day) with map-side partial aggregation; LISTAGG
groups are bounded by the dimension's cardinality, never the fact
table's; the recursive spine materializes one row per DAY of history
(a 100 TB corpus spanning a decade is ~3.7k rows) and joins it as the
broadcast side; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dungbeetle_spark.queries import _t, query


@query(
    "listagg_nation_suppliers",
    oracle="""
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers_csv,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="LISTAGG ... WITHIN GROUP (Spark 4 / SQL:2023; DuckDB spells "
    "it string_agg with an inner ORDER BY): per nation, the "
    "alphabetised roll of supplier names. The deterministic WITHIN "
    "GROUP order is what makes the string comparable across engines "
    "and partitionings — an unordered listagg is partition-order "
    "noise. Group count is the 25-row nation dimension, so the "
    "aggregate state stays tiny regardless of fact scale; the string "
    "itself grows with suppliers-per-nation, which is why real "
    "pipelines cap it (documented, not silently truncated here).",
)
def listagg_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "supplier", "nation")
    t["supplier"].createOrReplaceTempView("_la_supplier")
    t["nation"].createOrReplaceTempView("_la_nation")
    return spark.sql(
        """
        SELECT n.n_name,
               listagg(s.s_name, ',') WITHIN GROUP (ORDER BY s.s_name)
                 AS suppliers_csv,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM _la_supplier s JOIN _la_nation n
          ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@query(
    "ordered_set_event_stats",
    oracle="""
    WITH uc AS (
      SELECT event_type, user_id, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    top_user AS (
      SELECT event_type, user_id AS modal_user
      FROM (SELECT event_type, user_id,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY c DESC, user_id) AS rn
            FROM uc)
      WHERE rn = 1),
    pd AS (
      -- SQL-standard percentile_disc: the smallest value whose
      -- cumulative distribution reaches the fraction (spelled out via
      -- cume_dist so both engines compute the identical element
      -- rather than trusting each one's quantile flavor)
      SELECT event_type,
             MIN(value) FILTER (WHERE cd >= 0.5) AS median_value,
             MIN(value) FILTER (WHERE cd >= 0.9) AS p90_value
      FROM (SELECT event_type, value,
                   cume_dist() OVER (PARTITION BY event_type
                                     ORDER BY value) AS cd
            FROM events)
      GROUP BY event_type)
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ANY_VALUE(t.modal_user) AS modal_user,
           ANY_VALUE(p.median_value) AS median_value,
           ANY_VALUE(p.p90_value) AS p90_value
    FROM events e
    JOIN top_user t ON e.event_type = t.event_type
    JOIN pd p ON e.event_type = p.event_type
    GROUP BY e.event_type
    """,
    doc="Ordered-set aggregates (SQL:2023 / Spark 4): per event type, "
    "mode(user_id) with the deterministic smallest-on-ties flag and "
    "percentile_disc(0.5/0.9) WITHIN GROUP over the value column. "
    "percentile_disc RETURNS AN ELEMENT of the input (no "
    "interpolation arithmetic), which is what makes the doubles "
    "bit-identical cross-engine — percentile_cont's interpolation "
    "would be ULP-sensitive; udaf_median_value covers that form. The "
    "oracle spells the standard definitions out via window cume_dist "
    "/ row_number rather than trusting DuckDB's quantile flavor. One "
    "shuffle on the 5-value event_type key; mode's per-(type,user) "
    "state partial-aggregates map-side.",
)
def ordered_set_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "events")
    t["events"].createOrReplaceTempView("_os_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               mode(user_id, true) AS modal_user,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
                 AS median_value,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY value)
                 AS p90_value
        FROM _os_events
        GROUP BY event_type
        """
    )


@query(
    "recursive_daily_spine",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      FROM events),
    spine(day) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT day + 1 FROM spine, bounds
      WHERE day < hi),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1)
    SELECT s.day, COALESCE(d.n, 0) AS n_events
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4): the classic "
    "warehouse date-spine — walk from the corpus's first to last day "
    "one recursion step at a time, then left-join daily counts so "
    "silent days surface as explicit zeros. Same result contract as "
    "gap_fill_daily (which builds the spine with sequence()+explode): "
    "this pins the RECURSION surface a migrating warehouse user "
    "writes. The spine is one row per day of history (decades = "
    "thousands of rows) and broadcasts to the daily-counts join; the "
    "fact table aggregates once on the day key.",
)
def recursive_daily_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "events")
    t["events"].createOrReplaceTempView("_rs_events")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
          FROM _rs_events),
        spine(day) AS (
          SELECT lo FROM bounds
          UNION ALL
          SELECT date_add(day, 1) FROM spine, bounds
          WHERE day < hi),
        daily AS (
          SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
          FROM _rs_events GROUP BY 1)
        SELECT s.day, COALESCE(d.n, CAST(0 AS BIGINT)) AS n_events
        FROM spine s LEFT JOIN daily d ON s.day = d.day
        """
    )


@query(
    "activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    isl AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS anchor
      FROM days),
    runs AS (
      SELECT user_id, anchor, COUNT(*) AS len
      FROM isl GROUP BY 1, 2)
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM runs GROUP BY user_id
    """,
    doc="Gaps-and-islands: each user's longest run of consecutive "
    "active days and how many distinct runs they have. The island "
    "anchor is day minus row_number-as-days — consecutive days share "
    "an anchor, a gap starts a new one — the O(n) window idiom that "
    "replaces self-join-per-day approaches (quadratic in streak "
    "length). All arithmetic is dates and integers: bit-identical "
    "cross-engine. Two shuffles by design: the distinct shuffles "
    "map-side-DEDUPLICATED (user, day) pairs (partial aggregate "
    "before the exchange — at 100 TB this moves ≤ users x days rows, "
    "not the raw events; forcing a single user_id shuffle up front "
    "would move the full fact table), then the tiny day-set "
    "reshuffles on user_id for the window, whose partitioning the "
    "island and streak aggregates both reuse exchange-free (subset "
    "clustering).",
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "events")
    t["events"].createOrReplaceTempView("_st_events")
    return spark.sql(
        """
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM _st_events),
        isl AS (
          SELECT user_id, d,
                 date_sub(d, CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                                     ORDER BY d) AS INT))
                   AS anchor
          FROM days),
        runs AS (
          SELECT user_id, anchor, COUNT(*) AS len
          FROM isl GROUP BY user_id, anchor)
        SELECT user_id,
               CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks
        FROM runs GROUP BY user_id
        """
    )


@query(
    "events_variant_stats",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(COUNT(k) AS BIGINT) AS n_k
    FROM v
    GROUP BY event_type
    """,
    doc="VARIANT semi-structured type (new in Spark 4): parse the "
    "props JSON column into a VARIANT once, extract a typed field "
    "with variant_get, and aggregate it as a first-class BIGINT. "
    "Complements events_json_extract (string-path get_json_object): "
    "VARIANT is the scale path — the binary encoding parses the JSON "
    "once at scan time instead of re-parsing the string per "
    "extraction, which is the difference between one and k parses "
    "when k fields are pulled from 100 TB of logs. Integer outputs, "
    "hash-exact.",
)
def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "events")
    t["events"].createOrReplaceTempView("_va_events")
    return spark.sql(
        """
        WITH v AS (
          SELECT event_type,
                 variant_get(parse_json(props), '$.k', 'bigint') AS k
          FROM _va_events)
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(MAX(k) AS BIGINT) AS max_k,
               CAST(COUNT(k) AS BIGINT) AS n_k
        FROM v
        GROUP BY event_type
        """
    )


@query(
    "collated_event_type_counts",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS k
      FROM events)
    SELECT lower(k) AS event_type_ci,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM mixed
    GROUP BY lower(k)
    """,
    doc="Collation-aware grouping (Spark 4 collations): a "
    "deterministically case-mangled event_type (upper on even "
    "event_ids — the corpus itself is uniformly cased, so the mangle "
    "manufactures the mixed-case mess real ingest produces) grouped "
    "under UTF8_LCASE collation, which merges case variants in the "
    "GROUP BY itself rather than via lower() rewrites scattered "
    "through the query. The projected key is explicitly lower()ed "
    "because the collated group's representative value is whichever "
    "variant a partition saw first — not a contract. One shuffle on "
    "the 5-key collated column.",
)
def collated_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "events")
    t["events"].createOrReplaceTempView("_co_events")
    return spark.sql(
        """
        WITH mixed AS (
          SELECT collate(CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                              ELSE event_type END,
                         'UTF8_LCASE') AS k
          FROM _co_events)
        SELECT lower(k) AS event_type_ci,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM mixed
        GROUP BY k
        """
    )
