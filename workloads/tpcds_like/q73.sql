-- TPC-DS q71 shape: per-hour breakdown across unioned "channels" —
-- event value per (hour, event_type) over three unioned slices of the
-- events table, the time-dim join replaced by EXTRACT(HOUR).
SELECT hr, event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS val,
       COUNT(*) AS cnt
FROM (
  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr, event_type, value
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT), event_type, value
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT CAST(EXTRACT(HOUR FROM ts) AS BIGINT), event_type, value
  FROM events WHERE event_type = 'view')
GROUP BY hr, event_type
ORDER BY hr, event_type
