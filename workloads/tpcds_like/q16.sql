-- TPC-DS q5 shape: per-"channel" revenue/return rollup — three channel
-- subqueries (return flags) UNION ALLed, joined to supplier nation,
-- aggregated with ROLLUP over (channel, nation).
SELECT channel, n_name, COUNT(*) AS n_lines,
       CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM (
  SELECT 'store' AS channel, l_suppkey, l_extendedprice AS price
  FROM lineitem WHERE l_returnflag = 'N'
  UNION ALL
  SELECT 'catalog' AS channel, l_suppkey, l_extendedprice AS price
  FROM lineitem WHERE l_returnflag = 'A'
  UNION ALL
  SELECT 'web' AS channel, l_suppkey, l_extendedprice AS price
  FROM lineitem WHERE l_returnflag = 'R') channels
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY ROLLUP(channel, n_name)
ORDER BY channel NULLS FIRST, n_name NULLS FIRST
