-- TPC-DS q72 shape: demand vs lagged supply — weekly shipped quantity
-- per part with the prior week attached (LAG over an aggregate),
-- flagging weeks whose demand jumps 1.5x over the prior week, split by
-- promo status (the inventory-shortfall probe).
WITH wk AS (
  SELECT l_partkey, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         CAST(EXTRACT(WEEK FROM l_shipdate) AS BIGINT) AS wk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
  FROM lineitem
  GROUP BY l_partkey, EXTRACT(YEAR FROM l_shipdate),
           EXTRACT(WEEK FROM l_shipdate))
SELECT p_name,
       CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS promo,
       yr, wk, qty, prev_qty
FROM (
  SELECT l_partkey, yr, wk, qty,
         LAG(qty) OVER (PARTITION BY l_partkey ORDER BY yr, wk) AS prev_qty
  FROM wk) w
JOIN part ON l_partkey = p_partkey
WHERE prev_qty IS NOT NULL AND qty > prev_qty * 1.5
ORDER BY p_name, yr, wk
