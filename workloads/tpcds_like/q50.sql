-- TPC-DS q22 shape: product-hierarchy ROLLUP of average quantity —
-- avg at (brand, type, size), (brand, type), (brand), () levels in
-- one grouping-sets pass.
SELECT p_brand, p_type, p_size,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         AS avg_qty,
       COUNT(*) AS n
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP(p_brand, p_type, p_size)
ORDER BY avg_qty DESC, p_brand NULLS FIRST, p_type NULLS FIRST,
         p_size NULLS FIRST
LIMIT 100
