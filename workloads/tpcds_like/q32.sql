-- TPC-DS q33/q56/q60 shape: sum over per-channel aggregates restricted
-- to a key list, re-aggregated by brand. The reference's channel arms
-- are distinct tables; transposed onto the single fact they became
-- three identical lineitem-x-part joins differing only in
-- l_returnflag, so the UNION-of-aggregates folds into ONE scan/join
-- whose single decimal SUM equals the re-aggregated per-channel sums
-- (r5 rewrite, DuckDB-diffed value-identical at sf0.01 and sf0.1).
WITH target_parts AS (
  SELECT p_partkey, p_brand FROM part WHERE p_size BETWEEN 1 AND 15)
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
FROM lineitem JOIN target_parts ON l_partkey = p_partkey
WHERE l_returnflag IN ('R', 'N', 'A')
GROUP BY p_brand
ORDER BY total_rev DESC, p_brand
LIMIT 100
