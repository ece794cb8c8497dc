-- TPC-DS q14/q38 shape: INTERSECT across channels + uncorrelated
-- scalar subquery threshold + UNION ALL rollup of the channels.
WITH both_status AS (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
avg_price AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(*) AS ap
  FROM orders)
SELECT channel, COUNT(*) AS n,
       CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM (
  SELECT 'full' AS channel, o_totalprice AS price
  FROM orders JOIN both_status ON orders.o_custkey = both_status.o_custkey
  WHERE o_orderstatus = 'F'
    AND o_totalprice > (SELECT ap FROM avg_price)
  UNION ALL
  SELECT 'open' AS channel, o_totalprice AS price
  FROM orders JOIN both_status ON orders.o_custkey = both_status.o_custkey
  WHERE o_orderstatus = 'O'
    AND o_totalprice > (SELECT ap FROM avg_price))
GROUP BY ROLLUP(channel)
ORDER BY channel NULLS FIRST
