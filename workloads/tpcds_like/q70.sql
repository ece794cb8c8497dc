-- TPC-DS q57 shape: monthly brand revenue with its year average,
-- previous and next month attached (lag/lead + avg windows over one
-- aggregate), screening the strong deviations.
WITH m AS (
  SELECT p_brand, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mon,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, EXTRACT(YEAR FROM l_shipdate),
           EXTRACT(MONTH FROM l_shipdate))
SELECT p_brand, yr, mon, rev, yr_avg, prev_rev, next_rev
FROM (
  SELECT p_brand, yr, mon, rev,
         CAST(AVG(rev) OVER (PARTITION BY p_brand, yr) AS DOUBLE) AS yr_avg,
         LAG(rev) OVER (PARTITION BY p_brand ORDER BY yr, mon) AS prev_rev,
         LEAD(rev) OVER (PARTITION BY p_brand ORDER BY yr, mon) AS next_rev
  FROM m)
WHERE yr_avg > 0 AND ABS(rev - yr_avg) / yr_avg > 0.2
ORDER BY p_brand, yr, mon
