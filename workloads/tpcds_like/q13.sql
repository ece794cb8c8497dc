-- TPC-DS q95 shape: semi-join-heavy — orders shipped by more than one
-- distinct supplier (EXISTS twin-lineitem correlation) but never
-- returned (NOT EXISTS), counted distinct over a date window.
SELECT COUNT(DISTINCT o.o_orderkey) AS multi_supp_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_price
FROM orders o
WHERE o.o_orderdate BETWEEN CAST('1996-01-01' AS DATE)
                        AND CAST('1996-12-31' AS DATE)
  AND EXISTS (
    SELECT 1 FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey
     AND l1.l_suppkey <> l2.l_suppkey
    WHERE l1.l_orderkey = o.o_orderkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem lr
    WHERE lr.l_orderkey = o.o_orderkey AND lr.l_returnflag = 'R')
