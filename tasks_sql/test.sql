-- Shipped task fixtures, the engine analog of the reference's task
-- files (reference: sql/pg/test.postgres.sql, sql/test.sql.sample).
-- `entries` maps onto the synthetic `events` table: user_id/ts/value
-- ≈ entries.user_id/timestamp/amount (FIXTURES.md §B).
-- Placeholders: both $n (postgres style) and ? (mysql style) are
-- accepted and normalized at load time.

-- name: get_profit_summary
-- queue: analytics
SELECT SUM(value) AS total, CAST(ts AS DATE) AS entry_date
FROM events WHERE user_id = $1 GROUP BY CAST(ts AS DATE);

-- name: get_profit_entries
SELECT * FROM events WHERE user_id = $1;

-- name: get_profit_entries_by_date
SELECT * FROM events WHERE user_id = $1 AND ts > $2 AND ts < $3;

-- name: slow_query
-- raw: 1
-- Long-running query for async/cancellation testing, standing in for
-- the reference's SELECT pg_sleep($1) / SELECT SLEEP(?).
SELECT reflect('java.lang.Thread', 'sleep', 4000L) AS slept;

-- name: top_spenders
-- queue: analytics
-- conc: 5
SELECT user_id, SUM(value) AS spend
FROM events WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY spend DESC LIMIT ?;
