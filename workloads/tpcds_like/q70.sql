-- TPC-DS q57 shape: monthly brand revenue with its year average,
-- previous and next month attached (lag/lead + avg windows over one
-- aggregate), screening the strong deviations. The year average is a
-- window SUM over the EXACT decimal divided by a window COUNT (both
-- order-independent) — a double AVG() window would be
-- FP-order-dependent and engine-divergent.
WITH m AS (
  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS rev_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, EXTRACT(YEAR FROM l_shipdate),
           EXTRACT(MONTH FROM l_shipdate))
SELECT p_brand, yr, mon, rev, yr_avg, prev_rev, next_rev
FROM (
  SELECT p_brand, yr, mon,
         CAST(rev_dec AS DOUBLE) AS rev,
         CAST(SUM(rev_dec) OVER (PARTITION BY p_brand, yr) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY p_brand, yr) AS yr_avg,
         CAST(LAG(rev_dec) OVER w AS DOUBLE) AS prev_rev,
         CAST(LEAD(rev_dec) OVER w AS DOUBLE) AS next_rev
  FROM m
  WINDOW w AS (PARTITION BY p_brand ORDER BY yr, mon))
WHERE yr_avg > 0 AND ABS(rev - yr_avg) / yr_avg > 0.2
ORDER BY p_brand, yr, mon
