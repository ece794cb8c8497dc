-- TPC-DS q5 shape: per-"channel" revenue/return rollup — ROLLUP over
-- (channel, nation). The reference's three channel arms are distinct
-- TABLES (store/catalog/web sales); transposed onto the single-fact
-- fixture schema they became three scans of lineitem differing only in
-- the l_returnflag predicate, so the UNION ALL folds into ONE scan
-- with a CASE channel label (disjoint flags => identical rows/groups;
-- r5 single-scan rewrite, DuckDB-diffed value-identical).
SELECT channel, n_name, COUNT(*) AS n_lines,
       CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM (
  SELECT CASE l_returnflag WHEN 'N' THEN 'store'
              WHEN 'A' THEN 'catalog' ELSE 'web' END AS channel,
         l_suppkey, l_extendedprice AS price
  FROM lineitem WHERE l_returnflag IN ('N', 'A', 'R')) channels
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY ROLLUP(channel, n_name)
ORDER BY channel NULLS FIRST, n_name NULLS FIRST
