-- Funnel probe: 'view' events followed by a 'purchase' within one hour
-- for the same user — an event-time self-join with an interval band
-- (the range-join shape), counting converting views per user.
SELECT v.user_id AS user_id, COUNT(DISTINCT v.event_id) AS converting_views
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
GROUP BY v.user_id
ORDER BY converting_views DESC, user_id
LIMIT 100
