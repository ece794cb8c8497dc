-- TPC-DS q40 shape: net sales value per (supplier-nation, part) split
-- before/after a threshold date, returns netted out via CASE inside
-- the two conditional sums.
SELECT n_name, p_name,
       CAST(SUM(CASE WHEN l_shipdate < DATE '1998-01-01' THEN
         CAST(CASE WHEN l_returnflag = 'R' THEN -l_extendedprice
              ELSE l_extendedprice END AS DECIMAL(18,6))
         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS sales_before,
       CAST(SUM(CASE WHEN l_shipdate >= DATE '1998-01-01' THEN
         CAST(CASE WHEN l_returnflag = 'R' THEN -l_extendedprice
              ELSE l_extendedprice END AS DECIMAL(18,6))
         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS sales_after
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate BETWEEN DATE '1997-07-01' AND DATE '1998-06-30'
GROUP BY n_name, p_name
ORDER BY n_name, p_name
