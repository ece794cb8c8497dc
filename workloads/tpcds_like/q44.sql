-- TPC-DS q59 shape: week-over-week comparison — per (nation, weekday)
-- revenue in 1996 vs 1997 as a wide pivot joined on itself, emitting
-- the ratio per weekday column.
WITH wk AS (
  SELECT n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 1 THEN o_totalprice ELSE 0 END) AS sun_sales,
         SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 2 THEN o_totalprice ELSE 0 END) AS mon_sales,
         SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 3 THEN o_totalprice ELSE 0 END) AS tue_sales,
         SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 4 THEN o_totalprice ELSE 0 END) AS wed_sales
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate))
SELECT y1.n_name,
       y2.sun_sales / y1.sun_sales AS sun_ratio,
       y2.mon_sales / y1.mon_sales AS mon_ratio,
       y2.tue_sales / y1.tue_sales AS tue_ratio,
       y2.wed_sales / y1.wed_sales AS wed_ratio
FROM wk y1
JOIN wk y2 ON y1.n_name = y2.n_name AND y1.yr = 1996 AND y2.yr = 1997
WHERE y1.sun_sales > 0 AND y1.mon_sales > 0
  AND y1.tue_sales > 0 AND y1.wed_sales > 0
ORDER BY y1.n_name
