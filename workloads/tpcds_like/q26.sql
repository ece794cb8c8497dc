-- TPC-DS q98/q89 shape: revenue share within class — each part's
-- revenue as a fraction of its type-class total via a window sum over
-- the aggregate (ratio_to_report).
SELECT p_type, p_brand,
       item_rev,
       item_rev * 100 / SUM(item_rev) OVER (PARTITION BY p_type)
         AS revenue_share_pct
FROM (
  SELECT p_type, p_brand,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                  * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)
           AS item_rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_brand)
ORDER BY p_type, revenue_share_pct DESC, p_brand
LIMIT 200
