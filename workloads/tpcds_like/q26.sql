-- TPC-DS q98/q89 shape: revenue share within class — each part's
-- revenue as a fraction of its type-class total via a window sum over
-- the aggregate (ratio_to_report). The window SUM runs over the EXACT
-- decimal (order-independent); doubles only appear at the edge via the
-- decimal → string → double round-trip both engines parse identically.
SELECT p_type, p_brand,
       CAST(CAST(item_rev_dec AS STRING) AS DOUBLE) AS item_rev,
       CAST(CAST(item_rev_dec AS STRING) AS DOUBLE) * 100
         / CAST(CAST(SUM(item_rev_dec) OVER (PARTITION BY p_type)
                AS STRING) AS DOUBLE)
         AS revenue_share_pct
FROM (
  SELECT p_type, p_brand,
         SUM(CAST(l_extendedprice AS DECIMAL(18,6))
             * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS item_rev_dec
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_brand)
ORDER BY p_type, revenue_share_pct DESC, p_brand
LIMIT 200
