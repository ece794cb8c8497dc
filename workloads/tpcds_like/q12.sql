-- TPC-DS q67 shape: wide ROLLUP hierarchy (region → nation → segment)
-- over a dim-joined fact, then rank() within each rollup level keeping
-- the top rows per level — a grouping-sets + window + top-k filter
-- pipeline.
SELECT * FROM (
  SELECT r_name, n_name, c_mktsegment,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
           AS total_sales,
         GROUPING(r_name) + GROUPING(n_name) + GROUPING(c_mktsegment)
           AS lochierarchy,
         RANK() OVER (
           PARTITION BY GROUPING(r_name) + GROUPING(n_name)
                        + GROUPING(c_mktsegment)
           ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,6))) DESC) AS rk
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP(r_name, n_name, c_mktsegment))
WHERE rk <= 5
ORDER BY lochierarchy DESC, rk,
         r_name NULLS FIRST, n_name NULLS FIRST, c_mktsegment NULLS FIRST
