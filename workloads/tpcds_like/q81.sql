-- TPC-DS q86 shape: ROLLUP over the product hierarchy with RANK
-- computed inside each grouping level (partition on the grouping
-- flags — the lochierarchy trick).
SELECT p_type, p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev,
       CAST(GROUPING(p_type) + GROUPING(p_brand) AS BIGINT) AS lvl,
       RANK() OVER (
         PARTITION BY GROUPING(p_type), GROUPING(p_brand),
           CASE WHEN GROUPING(p_brand) = 1 THEN p_type END
         ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,6))) DESC) AS rnk
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP (p_type, p_brand)
ORDER BY lvl DESC, p_type NULLS FIRST, rnk, p_brand NULLS FIRST
