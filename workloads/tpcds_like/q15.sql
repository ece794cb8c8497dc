-- TPC-DS q47 shape: monthly brand revenue vs the brand's yearly
-- average (window avg over the year partition) with lag/lead month
-- neighbors — kept where the month deviates >10% from the average.
WITH monthly AS (
  SELECT p_brand AS brand,
         EXTRACT(YEAR FROM o_orderdate) AS yr,
         EXTRACT(MONTH FROM o_orderdate) AS mon,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate),
           EXTRACT(MONTH FROM o_orderdate))
SELECT brand, yr, mon, revenue,
       avg_rev,
       LAG(revenue) OVER w AS prev_rev,
       LEAD(revenue) OVER w AS next_rev
FROM (
  SELECT brand, yr, mon, revenue,
         AVG(revenue) OVER (PARTITION BY brand, yr) AS avg_rev
  FROM monthly)
WINDOW w AS (PARTITION BY brand ORDER BY yr, mon)
ORDER BY brand, yr, mon
LIMIT 200
