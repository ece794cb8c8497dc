-- Correlated NOT EXISTS with a join inside the subquery: customers who
-- never bought anything shipped by a supplier of their own nation,
-- counted per segment (decorrelates into a two-key anti join).
SELECT c_mktsegment, COUNT(*) AS cnt
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE o_custkey = c_custkey AND s_nationkey = c_nationkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
