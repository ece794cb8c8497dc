-- Three chained CTEs, each consuming the previous: monthly revenue ->
-- 3-month moving average over it (window over aggregate) -> months
-- beating their own trail.
WITH monthly AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM orders
  GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)),
trail AS (
  SELECT yr, mon, rev,
         CAST(AVG(rev) OVER (ORDER BY yr, mon
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS ma3
  FROM monthly),
beating AS (
  SELECT yr, mon, rev, ma3 FROM trail WHERE rev > ma3)
SELECT yr, mon, rev, ma3, rev - ma3 AS above
FROM beating
ORDER BY yr, mon
