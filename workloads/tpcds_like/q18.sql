-- TPC-DS q39 shape: coefficient-of-variation screen — per (part,
-- month) quantity stats, kept where stddev/mean > threshold, then
-- self-joined on consecutive months (the "inventory flickers twice in
-- a row" pattern).
WITH pm AS (
  SELECT l_partkey,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS mean_qty,
         STDDEV_SAMP(l_quantity) AS sd_qty,
         COUNT(*) AS n
  FROM lineitem
  WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
  GROUP BY l_partkey, EXTRACT(MONTH FROM l_shipdate)
  HAVING COUNT(*) >= 2),
flicker AS (
  SELECT l_partkey, mon, mean_qty, sd_qty
  FROM pm
  WHERE sd_qty / mean_qty > 0.5)
SELECT f1.l_partkey, f1.mon AS mon1, f2.mon AS mon2,
       f1.mean_qty AS mean1, f2.mean_qty AS mean2
FROM flicker f1
JOIN flicker f2 ON f1.l_partkey = f2.l_partkey AND f2.mon = f1.mon + 1
ORDER BY f1.l_partkey, f1.mon
LIMIT 100
