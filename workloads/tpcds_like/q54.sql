-- TPC-DS q55/q42/q52 shape: the minimal dim-agg probe — brand revenue
-- for one ship-month, the smallest query in the canon (planner floor
-- cost + broadcast dim sanity).
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS brand_rev
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE EXTRACT(YEAR FROM l_shipdate) = 1996
  AND EXTRACT(MONTH FROM l_shipdate) = 11
GROUP BY p_brand
ORDER BY brand_rev DESC, p_brand
LIMIT 100
