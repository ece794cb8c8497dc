-- TPC-DS q34/q73 shape: frequency-band cohort — orders with a line
-- count in a band, joined back to customers, returned as (customer,
-- order, count) sorted by the count descending.
WITH order_sizes AS (
  SELECT l_orderkey, COUNT(*) AS n_lines
  FROM lineitem
  GROUP BY l_orderkey
  HAVING COUNT(*) BETWEEN 5 AND 7)
SELECT c_name, c_custkey, o_orderkey, n_lines
FROM order_sizes
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY n_lines DESC, c_name, o_orderkey
LIMIT 100
