-- Sessionization in pure SQL: a session starts after a >30-minute gap
-- (LAG + conditional flag + aggregate), sessions counted per user —
-- the batch twin of the streaming sessionizer.
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL THEN 1
              WHEN ts > LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                        + INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS sessions,
       COUNT(*) AS events
FROM marked
GROUP BY user_id
ORDER BY sessions DESC, user_id
LIMIT 50
