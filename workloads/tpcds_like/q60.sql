-- TPC-DS q18 shape: averages at every level of a geography ROLLUP
-- (region -> nation -> segment), the level exposed via grouping().
SELECT r_name, n_name, c_mktsegment,
       CAST(GROUPING(r_name) + GROUPING(n_name) + GROUPING(c_mktsegment)
         AS BIGINT) AS lvl,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(o_totalprice) AS avg_total,
       COUNT(*) AS cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
ORDER BY lvl, r_name NULLS FIRST, n_name NULLS FIRST,
         c_mktsegment NULLS FIRST
