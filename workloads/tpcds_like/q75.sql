-- TPC-DS q74 shape: customers whose 1997/1996 spend ratio in the line
-- channel beats their ratio in the order channel — two per-channel
-- yearly aggregates joined four ways on the customer key.
WITH line_yr AS (
  SELECT o_custkey AS cust,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate)),
ord_yr AS (
  SELECT o_custkey AS cust,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey, EXTRACT(YEAR FROM o_orderdate))
SELECT l2.cust AS c_custkey,
       l2.total / l1.total AS line_growth,
       o2.total / o1.total AS order_growth
FROM line_yr l1
JOIN line_yr l2 ON l1.cust = l2.cust AND l1.yr = 1996 AND l2.yr = 1997
JOIN ord_yr o1 ON o1.cust = l1.cust AND o1.yr = 1996
JOIN ord_yr o2 ON o2.cust = l1.cust AND o2.yr = 1997
WHERE l1.total > 0 AND o1.total > 0
  AND l2.total / l1.total > o2.total / o1.total
ORDER BY line_growth DESC, c_custkey
