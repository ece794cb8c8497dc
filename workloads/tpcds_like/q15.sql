-- TPC-DS q47 shape: monthly brand revenue vs the brand's yearly
-- average (window avg over the year partition) with lag/lead month
-- neighbors — kept where the month deviates >10% from the average.
-- The yearly average is a window SUM over the DECIMAL monthly revenue
-- divided by a window COUNT (both order-independent), cast to DOUBLE
-- at the edge — a double AVG() window would be FP-order-dependent and
-- engine-divergent.
WITH monthly AS (
  SELECT p_brand AS brand,
         EXTRACT(YEAR FROM o_orderdate) AS yr,
         EXTRACT(MONTH FROM o_orderdate) AS mon,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS revenue_dec
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
  SELECT brand, CAST(yr AS BIGINT) AS yr, CAST(mon AS BIGINT) AS mon,
         CAST(revenue_dec AS DOUBLE) AS revenue,
         CAST(SUM(revenue_dec) OVER (PARTITION BY brand, yr) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY brand, yr) AS avg_rev
  FROM monthly)
WINDOW w AS (PARTITION BY brand ORDER BY yr, mon)
ORDER BY brand, yr, mon
LIMIT 200
