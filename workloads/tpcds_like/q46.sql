-- TPC-DS q46/q68 shape: location-mismatch screen — orders where the
-- customer's nation differs from the supplying nation of every line,
-- per-order aggregates joined back to the customer dim.
SELECT c_name, o.o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS order_rev,
       COUNT(*) AS n_lines
FROM orders o
JOIN customer ON o.o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN lineitem ON l_orderkey = o.o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY c_name, o.o_orderkey
HAVING COUNT(*) >= 4
ORDER BY order_rev DESC, c_name, o.o_orderkey
LIMIT 100
