-- TPC-DS q27 shape: attribution GROUPING SETS — revenue attributed at
-- (region, nation), (region), and () levels explicitly (not a rollup
-- prefix chain), with grouping_id disambiguation.
SELECT r_name, n_name,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS g_level,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
ORDER BY g_level, r_name NULLS FIRST, n_name NULLS FIRST
