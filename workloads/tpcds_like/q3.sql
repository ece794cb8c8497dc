-- TPC-DS q51 shape: two aggregates FULL OUTER JOINed, cumulative
-- window maxima over the coalesced keys.
WITH store_v AS (
  SELECT o_custkey AS custkey, DATE_TRUNC('month', o_orderdate) AS mon,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sales
  FROM orders WHERE o_orderstatus = 'F'
  GROUP BY o_custkey, DATE_TRUNC('month', o_orderdate)),
web_v AS (
  SELECT o_custkey AS custkey, DATE_TRUNC('month', o_orderdate) AS mon,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sales
  FROM orders WHERE o_orderstatus = 'O'
  GROUP BY o_custkey, DATE_TRUNC('month', o_orderdate))
SELECT custkey, mon, store_sales, web_sales,
       MAX(store_sales) OVER w AS cum_store_max,
       MAX(web_sales) OVER w AS cum_web_max
FROM (
  SELECT COALESCE(s.custkey, w.custkey) AS custkey,
         COALESCE(s.mon, w.mon) AS mon,
         s.sales AS store_sales, w.sales AS web_sales
  FROM store_v s FULL OUTER JOIN web_v w
    ON s.custkey = w.custkey AND s.mon = w.mon)
WINDOW w AS (PARTITION BY custkey ORDER BY mon
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY custkey, mon
LIMIT 100
