-- TPC-DS q87 shape: EXCEPT-based distinct-cohort count — customers who
-- ordered in 1996 but placed NO urgent order ever, counted via EXCEPT.
SELECT COUNT(*) AS cool_customers
FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT')
