-- TPC-DS q39 shape: coefficient-of-variation screen — per (part,
-- month) quantity stats, kept where stddev/mean > threshold, then
-- self-joined on consecutive months (the "inventory flickers twice in
-- a row" pattern). The CV threshold is evaluated in exact integer
-- arithmetic (quantities are integral):
--   sd_samp/mean > 1/2  <=>  4*n*(n*Q - S^2) > (n-1)*S^2
-- with S = SUM(qty), Q = SUM(qty^2) — a double STDDEV_SAMP would be
-- FP-order-dependent and engine-divergent at the boundary.
WITH pm AS (
  SELECT l_partkey,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s_qty,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS q_qty,
         COUNT(*) AS n
  FROM lineitem
  WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
  GROUP BY l_partkey, EXTRACT(MONTH FROM l_shipdate)
  HAVING COUNT(*) >= 2),
flicker AS (
  SELECT l_partkey, mon, CAST(s_qty AS DOUBLE) / n AS mean_qty
  FROM pm
  WHERE 4 * n * (n * q_qty - s_qty * s_qty) > (n - 1) * s_qty * s_qty)
SELECT f1.l_partkey, f1.mon AS mon1, f2.mon AS mon2,
       f1.mean_qty AS mean1, f2.mean_qty AS mean2
FROM flicker f1
JOIN flicker f2 ON f1.l_partkey = f2.l_partkey AND f2.mon = f1.mon + 1
ORDER BY f1.l_partkey, f1.mon
LIMIT 100
