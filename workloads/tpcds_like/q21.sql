-- TPC-DS q21 shape: before/after pivot ratio — per (supplier, part),
-- quantity shipped before vs after a pivot date as conditional sums,
-- kept when the ratio is inside [2/3, 3/2].
SELECT s_name, p_brand,
       SUM(CASE WHEN l_shipdate < CAST('1997-06-01' AS DATE)
                THEN l_quantity ELSE 0 END) AS qty_before,
       SUM(CASE WHEN l_shipdate >= CAST('1997-06-01' AS DATE)
                THEN l_quantity ELSE 0 END) AS qty_after
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate BETWEEN CAST('1997-01-01' AS DATE)
                     AND CAST('1997-12-31' AS DATE)
GROUP BY s_name, p_brand
HAVING SUM(CASE WHEN l_shipdate < CAST('1997-06-01' AS DATE)
                THEN l_quantity ELSE 0 END) > 0
   AND SUM(CASE WHEN l_shipdate >= CAST('1997-06-01' AS DATE)
                THEN l_quantity ELSE 0 END)
       / SUM(CASE WHEN l_shipdate < CAST('1997-06-01' AS DATE)
                  THEN l_quantity ELSE 0 END) BETWEEN 0.666 AND 1.5
ORDER BY s_name, p_brand
LIMIT 100
