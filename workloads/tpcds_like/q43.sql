-- TPC-DS q76 shape: null-column channel union — three channel arms
-- each projecting a different column as NULL, UNION ALLed, counted and
-- summed per (channel, year, col-presence).
SELECT channel, yr, COUNT(*) AS cnt,
       CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sales
FROM (
  SELECT 'returned' AS channel, l_returnflag AS flag, NULL AS status,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
         l_extendedprice AS price
  FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT 'open' AS channel, NULL AS flag, o_orderstatus AS status,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         o_totalprice AS price
  FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT 'urgent' AS channel, NULL AS flag, o_orderpriority AS status,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         o_totalprice AS price
  FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY channel, yr
ORDER BY channel, yr
