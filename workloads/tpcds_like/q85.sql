-- Grouped top-k on the stream table: the 3 highest-value events per
-- type (the rank-filter shape the native TopKPerKey operator
-- implements without a full sort).
SELECT event_type, event_id, value
FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn
  FROM events)
WHERE rn <= 3
ORDER BY event_type, value DESC, event_id
