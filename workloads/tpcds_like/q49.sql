-- TPC-DS q2 shape: week-over-year ratio — weekly revenue summed per
-- (week-of-year), joined against the SAME aggregate one year later,
-- emitting the per-week ratio columns.
WITH weekly AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS wk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM orders
  GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(WEEK FROM o_orderdate))
SELECT w1.wk, w1.rev AS rev_1996, w2.rev AS rev_1997,
       w2.rev / w1.rev AS yoy_ratio
FROM weekly w1
JOIN weekly w2 ON w1.wk = w2.wk AND w1.yr = 1996 AND w2.yr = 1997
WHERE w1.rev > 0
ORDER BY w1.wk
