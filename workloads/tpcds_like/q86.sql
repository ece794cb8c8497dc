-- Exact median without a median() builtin: symmetric ROW_NUMBERs from
-- both ends per nation — the rows whose two ranks differ by at most
-- one average to the group median.
WITH ranked AS (
  SELECT n_name, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY o_totalprice, o_orderkey) AS ra,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
SELECT n_name, CAST(AVG(o_totalprice) AS DOUBLE) AS median_total
FROM ranked
WHERE ABS(ra - rd) <= 1
GROUP BY n_name
ORDER BY n_name
