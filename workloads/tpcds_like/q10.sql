-- TPC-DS q14 shape (queries/q14.sql:12,21,36-56): cross-"channel"
-- INTERSECT to find parts sold in all three return-flag channels, an
-- uncorrelated average-sales threshold, and a ROLLUP over the UNION ALL
-- of the per-channel aggregates that clear the threshold.
WITH cross_parts AS (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
avg_sales AS (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS threshold
  FROM lineitem)
SELECT channel, brand, COUNT(*) AS n_sales,
       CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS total_sales
FROM (
  SELECT 'returned' AS channel, p_brand AS brand, l_extendedprice AS price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'R'
    AND l_partkey IN (SELECT l_partkey FROM cross_parts)
    AND l_extendedprice > (SELECT threshold FROM avg_sales)
  UNION ALL
  SELECT 'kept' AS channel, p_brand AS brand, l_extendedprice AS price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_returnflag = 'N'
    AND l_partkey IN (SELECT l_partkey FROM cross_parts)
    AND l_extendedprice > (SELECT threshold FROM avg_sales))
GROUP BY ROLLUP(channel, brand)
ORDER BY channel NULLS FIRST, brand NULLS FIRST
