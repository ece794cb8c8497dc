-- Last-event-per-key: each customer's most recent order status picked
-- by ROW_NUMBER over the reversed timeline, then cohort sizes per
-- status.
SELECT o_orderstatus AS last_status, COUNT(*) AS customers
FROM (
  SELECT o_custkey, o_orderstatus,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders)
WHERE rn = 1
GROUP BY o_orderstatus
ORDER BY last_status
