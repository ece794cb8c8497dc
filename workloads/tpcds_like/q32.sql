-- TPC-DS q33/q56/q60 shape: sum over a UNION of per-channel aggregates
-- restricted to a key list — three channel arms each joining the same
-- part filter, UNION ALLed and re-aggregated by brand.
WITH target_parts AS (
  SELECT p_partkey, p_brand FROM part WHERE p_size BETWEEN 1 AND 15),
per_channel AS (
  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem JOIN target_parts ON l_partkey = p_partkey
  WHERE l_returnflag = 'R' GROUP BY p_brand
  UNION ALL
  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem JOIN target_parts ON l_partkey = p_partkey
  WHERE l_returnflag = 'N' GROUP BY p_brand
  UNION ALL
  SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
  FROM lineitem JOIN target_parts ON l_partkey = p_partkey
  WHERE l_returnflag = 'A' GROUP BY p_brand)
SELECT p_brand, CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
FROM per_channel
GROUP BY p_brand
ORDER BY total_rev DESC, p_brand
LIMIT 100
