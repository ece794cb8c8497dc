-- TPC-DS q16/q94 shape: EXISTS (semi) + NOT EXISTS (anti) + date
-- interval range + multi-distinct aggregate.
SELECT COUNT(DISTINCT o1.o_orderkey) AS order_count,
       CAST(SUM(CAST(o1.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM orders o1
JOIN customer ON o1.o_custkey = c_custkey
WHERE o1.o_orderdate BETWEEN CAST('1995-01-01' AS DATE)
                         AND CAST('1995-01-01' AS DATE) + INTERVAL '60' DAY
  AND EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o1.o_orderkey
      AND l_shipdate > o1.o_orderdate)
  AND NOT EXISTS (
    SELECT 1 FROM orders o2 WHERE o2.o_custkey = o1.o_custkey
      AND o2.o_orderkey <> o1.o_orderkey
      AND o2.o_orderdate = o1.o_orderdate)
