-- TPC-DS q59 shape: week-over-week comparison — per (nation, weekday)
-- revenue in 1996 vs 1997 as a wide pivot joined on itself, emitting
-- the ratio per weekday column. Weekday sums are DECIMAL-exact and
-- cast to DOUBLE at the CTE edge so the ratios divide doubles.
-- NOTE dialect: Spark DAYOFWEEK is Sunday=1; the DuckDB oracle twin
-- (TpcdsPromoted.dialectPromoted) shifts the constants to Sunday=0.
WITH wk AS (
  SELECT n_name,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 1 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS sun_sales,
         CAST(SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 2 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS mon_sales,
         CAST(SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 3 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS tue_sales,
         CAST(SUM(CASE WHEN DAYOFWEEK(o_orderdate) = 4 THEN CAST(o_totalprice AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS wed_sales
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
