-- TPC-DS q23 shape (queries/q23.sql): multi-CTE with HAVING filters —
-- "frequent items" (count threshold) and "best customers" (spend above
-- a scalar-subquery-derived threshold) — then a fact aggregate
-- restricted by IN on both CTEs. Exercises semi-join planning + CTE
-- reuse + HAVING pushup.
WITH frequent_parts AS (
  SELECT l_partkey
  FROM lineitem
  GROUP BY l_partkey
  HAVING COUNT(*) > 4),
best_customers AS (
  SELECT o_custkey
  FROM orders
  GROUP BY o_custkey
  HAVING SUM(CAST(o_totalprice AS DECIMAL(18,6))) >
    (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
     FROM orders) / 400)
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS total_sales
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
  AND o_custkey IN (SELECT o_custkey FROM best_customers)
